#!/usr/bin/env python3
"""Round-over-round sweep-mover detector (the r13 isolation rule).

Compares two bench JSONs per key and lists every common key whose reading
moved more than RATIO in either direction — each such key must get an
isolated min-of-N re-measure recorded in the scale doc BEFORE any narrative
cause is written (VERDICT r13 What's-wrong #1: a sweep artifact narrated as
dup-density scaling).

Usage: python3 tools/movers.py old_bench.json new_bench.json [ratio]
"""
import json, sys

RATIO = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

def qmap(path):
    d = json.load(open(path))
    qs = d.get("queries") or {}
    if not qs or all(v < 0 for v in qs.values()):
        side = d.get("queries_file")
        if side:
            qs = json.load(open(side)).get("queries", {})
    return {k: v for k, v in qs.items() if v >= 0}

old, new = qmap(sys.argv[1]), qmap(sys.argv[2])
common = sorted(set(old) & set(new))
movers = []
for k in common:
    a, b = old[k], new[k]
    if a <= 0 or b <= 0:
        continue
    r = b / a
    if r > RATIO or r < 1 / RATIO:
        movers.append((r, k, a, b))
for r, k, a, b in sorted(movers, reverse=True):
    print(f"{k}: {a:.2f} -> {b:.2f}  (x{r:.2f})  NEEDS ISOLATED RE-MEASURE")
only_new = sorted(set(new) - set(old))
if only_new:
    print("new keys (no prior reading):", ", ".join(only_new))
# keys that disappeared between sweeps escape the isolation ritual unless
# surfaced: removed bench surface is a change the scale doc must explain
dropped = sorted(set(old) - set(new))
if dropped:
    print("dropped keys (present only in OLD sweep):", ", ".join(dropped))
if not movers:
    print(f"no >={RATIO}x movers among {len(common)} common keys")
