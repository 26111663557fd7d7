#!/usr/bin/env python3
"""Compare a BENCH json at a larger SF against a smaller-SF run: per-query
median ratio vs the data-size factor, flagging super-linear scalers.

Usage: python3 tools/compare_scaling.py BENCH_small.json BENCH_large.json [factor]

A query is flagged SUPER-LINEAR when its median grew by more than the data
factor (cost worse than O(n) locally — worth a cause note in COVERAGE.md),
and SUB-0.5x-LINEAR notes are informational (fixed overheads amortizing).
"""
import json, sys

small = json.load(open(sys.argv[1]))
large = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

sq, lq = small["queries"], large["queries"]
common = sorted(set(sq) & set(lq))
only_s = sorted(set(sq) - set(lq))
only_l = sorted(set(lq) - set(sq))

rows = []
for q in common:
    a, b = sq[q], lq[q]
    if a <= 0 or b <= 0:
        rows.append((float("inf"), q, a, b, "FAILED-PASS"))
        continue
    r = b / a
    tag = ("SUPER-LINEAR" if r > factor
           else "~linear" if r > factor / 2
           else "amortized")
    rows.append((r, q, a, b, tag))

rows.sort(reverse=True)
print(f"{'query':40s} {'small':>8s} {'large':>8s} {'ratio':>7s}  verdict (factor {factor:g}x)")
for r, q, a, b, tag in rows:
    print(f"{q:40s} {a:8.2f} {b:8.2f} {r:7.2f}  {tag}")
for q in only_l:
    print(f"{q:40s} {'-':>8s} {lq[q]:8.2f} {'':7s}  large-only")
for q in only_s:
    print(f"{q:40s} {sq[q]:8.2f} {'-':>8s} {'':7s}  small-only")

sup = [q for r, q, *_ in [(r, q) for r, q, a, b, t in rows if t == "SUPER-LINEAR"]]
tot_s = sum(sq[q] for q in common)
tot_l = sum(lq[q] for q in common)
print(f"\ntotals over {len(common)} common queries: {tot_s:.1f}s -> {tot_l:.1f}s "
      f"({tot_l / tot_s:.2f}x at {factor:g}x data)")
print(f"super-linear: {len(sup)}" + (f" -> {', '.join(sup)}" if sup else ""))
