#!/usr/bin/env python3
"""Compare two Bench records (e.g. sf1 vs sf0.1): per-query ratios,
sorted descending, flagging anything super-linear (> rep x 1.5 by
default) for plan diagnosis. Usage:

    python3 tools/sf_ratio.py BENCH_LOCAL.json BENCH_SF1.json [rep=10]

Fixed per-query costs (planning, codegen, commit scheduling) make the
expected ratio for data-linear work LESS than rep; a ratio near or
above rep means the data-dependent part is super-linear and needs a
plan look.
"""
import json
import sys


def main() -> None:
    base_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
    scaled_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF1.json"
    rep = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    base = json.load(open(base_path))
    scaled = json.load(open(scaled_path))
    bq, sq = base["queries"], scaled["queries"]
    rows = []
    for name in sorted(bq):
        if name in sq and bq[name] > 0:
            rows.append((sq[name] / bq[name], bq[name], sq[name], name))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'query':34s} {'base_s':>7s} {'scaled_s':>8s} {'ratio':>6s}")
    for ratio, b, s, name in rows:
        mark = ""
        if ratio > rep * 1.5:
            mark = "  <-- SUPER-LINEAR"
            flagged += 1
        print(f"{name:34s} {b:7.2f} {s:8.2f} {ratio:6.2f}{mark}")
    total_b = sum(bq[n] for _, _, _, n in rows)
    total_s = sum(sq[n] for _, _, _, n in rows)
    print(f"\n{'TOTAL (common queries)':34s} {total_b:7.1f} {total_s:8.1f} "
          f"{total_s / total_b:6.2f}")
    print(f"rep={rep:g}; flagged super-linear (> {rep * 1.5:g}x): {flagged}")
    be, se = base.get("extras", {}), scaled.get("extras", {})
    common = [k for k in be if k in se]
    if common:
        print(f"\n{'extra':34s} {'base':>9s} {'scaled':>9s} {'ratio':>6s}")
        for k in common:
            if be[k] > 0:
                print(f"{k:34s} {be[k]:9.2f} {se[k]:9.2f} "
                      f"{se[k] / be[k]:6.2f}")


if __name__ == "__main__":
    main()
