#!/usr/bin/env python3
"""Local pre-validation of SparkEntry results vs the DuckDB oracle.

Mimics the driver's t2 gate: run each oracle_sql.json entry in DuckDB over the
testdata parquet tables, compare to the Spark-written parquet in outDir —
columns sorted by name, values hashed exactly (floats must be bit-identical).
Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # sort rows by all columns for order-insensitive compare (strict mode also
    # checks as-is order)
    return df

def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            if not np.array_equal(av.astype('f8'), bv.astype('f8'), equal_nan=True):
                return False
        else:
            if not (pd.Series(av).astype(object).fillna('<NA>') ==
                    pd.Series(bv).astype(object).fillna('<NA>')).all():
                return False
    return True

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            ok_ordered = values_equal(want.reset_index(drop=True), got.reset_index(drop=True))
            if ok_ordered:
                print(f"  OK   {name} ({len(got)} rows)")
                n_ok += 1
            else:
                ws = want.sort_values(by=list(want.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
                gs = got.sort_values(by=list(got.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
                if values_equal(ws, gs):
                    print(f"  OK*  {name} ({len(got)} rows) — row ORDER differs only")
                    n_ok += 1
                else:
                    print(f"  FAIL {name}: want {len(want)}x{list(want.columns)}, got {len(got)}x{list(got.columns)}")
                    print("   want:", want.head(3).to_dict('records'))
                    print("   got :", got.head(3).to_dict('records'))
        except Exception as e:
            print(f"  ERR  {name}: {e}")
    # rows-only entries
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"  {'rows-ok' if n > 0 else 'ROWS-EMPTY'} {d} ({n} rows, no oracle)")
    print(f"{n_ok}/{len(oracle)} oracle queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
