#!/usr/bin/env python3
"""Compare two bench records with host-speed normalization.

    python3 tools/compare_bench.py OLD.json NEW.json [threshold=2.0]

Per-query ratios are divided by the host-proxy ratio (parallel proxy
preferred — the inventory is parallel work; serial reported for
context) before anything is called a regression. Queries present in
only one record are listed, not compared. Exit 1 if any normalized
ratio exceeds the threshold.

Rationale: this host's speed varies ~2.5x between runs (BASELINE.md
round-3b and round-6); raw ratios conflate that with code changes.
If either record lacks proxies (pre-r6), the proxy ratio falls back
to 1.0 and the output says so — interpret raw ratios with care.
"""
import json
import sys


def load(path: str) -> dict:
    """A bench record, unwrapping the driver's round-wrapper shape
    (BENCH_rNN.json stores the stdout record under "parsed")."""
    rec = json.load(open(path))
    return rec["parsed"] if "parsed" in rec and "queries" not in rec else rec


def main() -> None:
    old = load(sys.argv[1])
    new = load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    def proxy(rec, name):
        return rec.get("extras", {}).get(name)

    pr = None
    for name in ("host_parallel_proxy_sec", "host_serial_proxy_sec"):
        po, pn = proxy(old, name), proxy(new, name)
        if po and pn:
            pr = pn / po
            print(f"host proxy ratio ({name}): {pr:.2f}x "
                  f"({po:.3f} -> {pn:.3f} s)")
            break
    if pr is None:
        pr = 1.0
        print("WARNING: no shared host proxy in both records — "
              "ratios are RAW and conflate host speed with code")

    qo, qn = old["queries"], new["queries"]
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"only in OLD: {only_old}")
    if only_new:
        print(f"only in NEW: {only_new}")

    rows = []
    for q in sorted(set(qo) & set(qn)):
        if qo[q] <= 0.05:  # too small to ratio meaningfully
            continue
        raw = qn[q] / qo[q]
        rows.append((raw / pr, raw, q))
    rows.sort(reverse=True)

    flagged = [r for r in rows if r[0] > threshold]
    print(f"\n{len(rows)} compared; "
          f"{len(flagged)} over {threshold}x NORMALIZED:")
    for norm, raw, q in (flagged or rows[:10]):
        print(f"  {q:35s} raw {raw:5.2f}x  normalized {norm:5.2f}x"
              f"  ({qo[q]:6.2f} -> {qn[q]:6.2f} s)")
    to, tn = sum(qo.values()), sum(qn.values())
    print(f"\ntotals: {to:.1f} -> {tn:.1f} s "
          f"(raw {tn / to:.2f}x, normalized {tn / to / pr:.2f}x)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
