#!/usr/bin/env python3
"""Build the per-query scaling table for SCALE_r4.md from two Bench JSON
lines (sf0.1 and sf1). Flags any query whose time grows more than FLAG_RATIO
for the 10x data growth (super-linear scaling suspect).
Usage: python3 tools/scale_report.py bench_sf01.json bench_sf1.json
"""
import json, os, sys

FLAG_RATIO = 15.0

def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                d = json.loads(line)
                # Bench's COMPACT stdout line carries a failures-only
                # "queries" map plus a "queries_file" pointer to the full
                # sidecar; silently rendering it would print an empty
                # per-query table. Follow the pointer, else refuse.
                if d.get("n_queries", 0) > len(d.get("queries", {})):
                    qf = d.get("queries_file")
                    if not qf:
                        raise SystemExit(
                            f"{p}: compact bench line ({d.get('n_queries')} queries, "
                            f"{len(d.get('queries', {}))} in map) with no "
                            "queries_file pointer — pass the sidecar instead")
                    # the pointer names the FIXED last-writer-wins sidecar
                    # (target/bench_last.json): if a later bench run (the
                    # other scale, a single-key re-measure) overwrote it,
                    # both load() calls would silently read the SAME data
                    # and every ratio would print 1.0 — validate that the
                    # sidecar is this capture's run before trusting it
                    if not os.path.exists(qf):
                        qf = os.path.join(os.path.dirname(os.path.abspath(p)), qf)
                    with open(qf) as g:
                        full = json.load(g)
                    for key in ("sf", "n_queries", "value"):
                        if full.get(key) != d.get(key):
                            raise SystemExit(
                                f"{p}: sidecar {qf} is from a DIFFERENT bench run "
                                f"({key}: {full.get(key)!r} != {d.get(key)!r}) — "
                                "it was overwritten; pass the preserved sidecar copy")
                    d = full
                return d
    raise SystemExit(f"no bench JSON line in {p}")

def main(p01, p1):
    a, b = load(p01), load(p1)
    qa, qb = a["queries"], b["queries"]
    rows = []
    # union of both benches: a query present on only one side (added or
    # dropped at scale) must still appear — rendered n/a, never omitted
    for k in sorted(set(qa) | set(qb)):
        t0, t1 = qa.get(k), qb.get(k)
        ratio = (t1 / t0) if t0 and t1 and t0 > 0 and t1 > 0 else float("nan")
        rows.append((k, t0, t1, ratio))
    rows.sort(key=lambda r: -(r[3] if r[3] == r[3] else -1))
    print("| query | sf0.1 s | sf1 s | x (10x data) |")
    print("| --- | --- | --- | --- |")
    flagged, one_sided_keys = [], []
    for k, t0, t1, r in rows:
        one_sided = t0 is None or t1 is None
        # a one-sided query has no ratio — report it in its OWN bucket, not
        # as a super-linear suspect (no scaling claim was ever computed)
        mark = ""
        if one_sided:
            one_sided_keys.append(k)
            mark = " **ONE-SIDED**"
        elif r == r and r > FLAG_RATIO:
            flagged.append(k)
            mark = " **FLAG**"
        f0 = f"{t0:.2f}" if t0 is not None else "n/a"
        f1 = f"{t1:.2f}" if t1 is not None else "n/a"
        fr = f"{r:.1f}" if r == r else "n/a"
        print(f"| {k}{mark} | {f0} | {f1} | {fr} |")
    print()
    print(f"total: sf0.1 {a['value']:.1f}s -> sf1 {b['value']:.1f}s "
          f"({b['value']/a['value']:.1f}x for 10x data)")
    print(f"flagged (> {FLAG_RATIO}x): {flagged or 'none'}")
    print(f"one-sided (present in only one bench): {one_sided_keys or 'none'}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
