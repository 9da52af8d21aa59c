#!/usr/bin/env python3
"""Compare two Bench JSON snapshots (e.g. sf0.1 vs sf1) and flag
super-linear queries.

Usage: python3 tools/bench_compare.py <base.json> <scaled.json> <scale_factor>
Prints per-query ratios sorted descending; a query is flagged when
scaled > scale_factor * 2 * max(base, floor) — the same overhead-floored
envelope ScalingSmokeSpec uses (floor 1.0 s).
"""
import json, sys

base_f, scaled_f, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
base = json.load(open(base_f))["queries"]
scaled = json.load(open(scaled_f))["queries"]
floor = 1.0

rows = []
for q, t in scaled.items():
    b = base.get(q)
    if b is None:
        continue
    bound = factor * 2 * max(b, floor)
    rows.append((q, b, t, t / max(b, 1e-3), t > bound))

rows.sort(key=lambda r: -r[3])
flagged = [r for r in rows if r[4]]
print(f"{'query':34s} {'base':>8s} {'scaled':>8s} {'ratio':>7s}  flag")
for q, b, t, r, f in rows:
    print(f"{q:34s} {b:8.3f} {t:8.3f} {r:7.2f}  {'SUPERLINEAR' if f else ''}")
tb = sum(base.values()); ts = sum(scaled.values())
print(f"\ntotal base {tb:.1f}s scaled {ts:.1f}s ratio {ts/tb:.2f} "
      f"(envelope {factor}x data)")
print(f"flagged: {len(flagged)}")
sys.exit(1 if flagged else 0)
