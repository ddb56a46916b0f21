#!/usr/bin/env python3
"""Oracle-side superlinear-growth detector (r10 verdict item 6).

The engine has a three-point scale story; the DuckDB CHECKER is the
next bottleneck (the sf10 record needed 24-56 GB caps and 2400 s
timeouts). This compares the per-query `oracle_sec` of two correctness
records at different scales and flags every oracle whose runtime grew
faster than the data did — the replays to rewrite (MATERIALIZED CTEs,
pre-aggregation) before the next scale point, independent of engine
health.

Usage:
  python3 tools/oracle_growth.py <rec_lo.json> <rec_hi.json> <data_ratio>

Flags queries with sec_hi / max(sec_lo, floor) > data_ratio * slack
(slack 1.5: replica hosts differ between sittings; sub-floor times are
scheduler noise, not growth). Advisory (exit 0) with a machine-readable
summary line; the per-round SCALE.md table cites its output.
"""
import json, sys

FLOOR = 2.0   # seconds: below this, growth ratios are timer noise
SLACK = 1.5

rec_lo = json.load(open(sys.argv[1]))
rec_hi = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3])

rows = []
for q, hi in rec_hi.items():
    if q.startswith("_") or not isinstance(hi, dict):
        continue
    lo = rec_lo.get(q)
    s_hi = hi.get("oracle_sec")
    s_lo = lo.get("oracle_sec") if isinstance(lo, dict) else None
    if s_hi is None or s_lo is None:
        continue
    growth = s_hi / max(s_lo, FLOOR)
    rows.append((growth, q, s_lo, s_hi))

rows.sort(reverse=True)
flagged = [(g, q, lo, hi) for g, q, lo, hi in rows
           if g > ratio * SLACK and hi > FLOOR]

print(f"# oracle growth {sys.argv[1]} -> {sys.argv[2]} "
      f"(data x{ratio:g}, flag > x{ratio * SLACK:g})")
print("top movers (growth, lo_sec -> hi_sec):")
for g, q, lo, hi in rows[:10]:
    mark = " <-- SUPERLINEAR" if (g, q, lo, hi) in flagged else ""
    print(f"  {q}: x{g:.1f} ({lo:.1f}s -> {hi:.1f}s){mark}")
print("slowest at the high point:")
for g, q, lo, hi in sorted(rows, key=lambda r: -r[3])[:5]:
    print(f"  {q}: {hi:.1f}s")
print(json.dumps({"metric": "oracle_growth", "data_ratio": ratio,
                  "n_compared": len(rows),
                  "n_flagged": len(flagged),
                  "flagged": [q for _, q, _, _ in flagged]}))
