#!/usr/bin/env python3
"""Local pre-validation of SparkEntry results vs the DuckDB oracle.

Mimics the driver's t2 gate: run each oracle_sql.json entry in DuckDB over the
testdata parquet tables, compare to the Spark-written parquet in outDir —
columns sorted by name, rows compared IN ORDER, values hashed exactly (floats
bit-identical; int-vs-float dtype kind mismatches fail, since the driver's
value hash distinguishes 5 from 5.0). Exits nonzero on any failure so the gate
is scriptable.
Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].reset_index(drop=True)

def col_diff(a: pd.DataFrame, b: pd.DataFrame):
    """Return None if equal, else a human-readable first-difference string."""
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        ak = av.dtype.kind if av.dtype.kind != 'u' else 'i'
        bk = bv.dtype.kind if bv.dtype.kind != 'u' else 'i'
        # int-vs-float is a real mismatch (driver hashes 5 and 5.0 differently)
        if {ak, bk} == {'i', 'f'}:
            return f"col {c}: dtype kind {av.dtype} vs {bv.dtype} (int/float mismatch)"
        if ak == 'f' or bk == 'f':
            if not np.array_equal(av.astype('f8'), bv.astype('f8'), equal_nan=True):
                i = int(np.where(~((av == bv) | (pd.isna(av) & pd.isna(bv))))[0][0])
                return f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
        else:
            eq = (pd.Series(av).astype(object).fillna('<NA>') ==
                  pd.Series(bv).astype(object).fillna('<NA>'))
            if not eq.all():
                i = int(eq.idxmin())
                return f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
    return None

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # ScaleData-generated dirs store events.ts as raw int64 nanos (Spark can't
    # write TIMESTAMP(NANOS)); rebuild the timestamp view with the same
    # nanos->micros truncation Spark applies so oracles see a timestamp either
    # way. Driver-generated dirs keep their native TIMESTAMP_NS view.
    ts_type = con.sql("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0]
    if ts_type == "BIGINT":
        con.sql("DROP VIEW events")
        con.sql(f"CREATE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) "
                f"FROM '{sf_dir}/events.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok, failed = 0, []
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            diff = col_diff(want, got)
            if diff is None:
                print(f"  OK   {name} ({len(got)} rows)")
                n_ok += 1
            else:
                print(f"  FAIL {name}: {diff}")
                print("   want:", want.head(3).to_dict('records'))
                print("   got :", got.head(3).to_dict('records'))
                failed.append(name)
        except Exception as e:
            print(f"  ERR  {name}: {e}")
            failed.append(name)
    empty = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"  {'rows-ok' if n > 0 else 'ROWS-EMPTY'} {d} ({n} rows, no oracle)")
            if n == 0:
                empty.append(d)
    print(f"{n_ok}/{len(oracle)} oracle queries match")
    if failed or empty:
        print(f"GATE FAIL: failed={failed} empty={empty}")
        sys.exit(1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
