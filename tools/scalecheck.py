#!/usr/bin/env python3
"""Scale-soak analyzer: compare two Bench JSON outputs (e.g. sf0.1 vs
sf1) and report per-query time ratios against the data-scale ratio.

Usage: python3 tools/scalecheck.py <bench_small.json> <bench_big.json> [scale_ratio]

A query is 'linear' when t_big/t_small <= scale_ratio (default 10).
Most small queries are dominated by fixed per-query machinery (session
dispatch, shuffle setup, checkpoint/sink commit for streams), so
ratios well under the scale ratio are expected; anything ABOVE it is
super-linear and needs an explanation. Dev tool only.
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs = small["queries"] if "queries" in small else small
qb = big["queries"] if "queries" in big else big

rows = []
for name, t_small in sorted(qs.items()):
    if name not in qb:
        continue
    t_big = qb[name]
    r = t_big / t_small if t_small > 0 else float("inf")
    rows.append((r, name, t_small, t_big))

rows.sort(reverse=True)
over = [x for x in rows if x[0] > ratio]
print(f"{len(rows)} common queries; scale ratio {ratio}x; "
      f"{len(over)} super-linear (> {ratio}x)")
print(f"total: {sum(x[2] for x in rows):.1f}s -> {sum(x[3] for x in rows):.1f}s "
      f"({sum(x[3] for x in rows)/max(sum(x[2] for x in rows),1e-9):.2f}x)")
print("\nworst 25 by ratio:")
for r, name, ts, tb in rows[:25]:
    flag = " <-- SUPER-LINEAR" if r > ratio else ""
    print(f"  {r:6.2f}x  {ts:7.2f}s -> {tb:7.2f}s  {name}{flag}")
if over:
    print("\nALL super-linear queries:")
    for r, name, ts, tb in over:
        print(f"  {r:6.2f}x  {ts:7.2f}s -> {tb:7.2f}s  {name}")
