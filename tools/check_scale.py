#!/usr/bin/env python3
"""Validate a GenScale output directory against its source: row counts
scale by rep (dims fixed), keys stay unique, FK integrity holds, and
the document/embedding perturbation kept duplicate density LINEAR
(constant per-row) instead of letting replicas collide into quadratic
pair growth. Usage:

    python3 tools/check_scale.py /root/testdata/sf0.1 localdata/sf1 [rep=10]
"""
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "localdata/sf1"
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    fails = 0

    def check(name: str, ok: bool, detail: str) -> None:
        nonlocal fails
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}")
        if not ok:
            fails += 1

    import os

    def pq(base: str, t: str) -> str:
        path = f"{base}/{t}.parquet"
        return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"

    def q(sql: str):
        return con.execute(sql).fetchone()[0]

    fixed = {"region", "nation"}
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    keys = {"customer": "c_custkey", "supplier": "s_suppkey",
            "part": "p_partkey", "orders": "o_orderkey",
            "events": "event_id", "documents": "doc_id",
            "embeddings": "vec_id"}
    for t in tables:
        ns = q(f"SELECT count(*) FROM {pq(src, t)}")
        nd = q(f"SELECT count(*) FROM {pq(dst, t)}")
        want = ns if t in fixed else ns * rep
        check(f"{t} rows", nd == want, f"{nd} (want {want})")
        if t in keys:
            k = keys[t]
            dk = q(f"SELECT count(DISTINCT {k}) FROM {pq(dst, t)}")
            check(f"{t}.{k} unique", dk == nd, f"{dk} distinct / {nd} rows")

    # FK integrity: every scaled orders.o_custkey resolves to a customer
    orphans = q(f"""SELECT count(*) FROM {pq(dst, 'orders')} o
        WHERE NOT EXISTS (SELECT 1 FROM {pq(dst, 'customer')} c
                          WHERE c.c_custkey = o.o_custkey)""")
    check("orders->customer FK", orphans == 0, f"{orphans} orphans")
    orphans = q(f"""SELECT count(*) FROM {pq(dst, 'lineitem')} l
        WHERE NOT EXISTS (SELECT 1 FROM {pq(dst, 'orders')} o
                          WHERE o.o_orderkey = l.l_orderkey)""")
    check("lineitem->orders FK", orphans == 0, f"{orphans} orphans")

    # Same-replica resolution (existence alone can't see this): every
    # FK must land in ITS OWN replica's parent block. Replica i of a
    # key domain occupies [i*off, (i+1)*off) where off = source parent
    # max+1 — so the block index of each FK must match the row's own.
    cust_off = q(f"SELECT max(c_custkey)+1 FROM {pq(src, 'customer')}")
    order_off = q(f"SELECT max(o_orderkey)+1 FROM {pq(src, 'orders')}")
    part_off = q(f"SELECT max(p_partkey)+1 FROM {pq(src, 'part')}")
    supp_off = q(f"SELECT max(s_suppkey)+1 FROM {pq(src, 'supplier')}")
    bad = q(f"""SELECT count(*) FROM {pq(dst, 'orders')}
        WHERE o_custkey // {cust_off} != o_orderkey // {order_off}""")
    check("orders FK same-replica", bad == 0, f"{bad} cross-replica rows")
    bad = q(f"""SELECT count(*) FROM {pq(dst, 'lineitem')}
        WHERE l_partkey // {part_off} != l_orderkey // {order_off}
           OR l_suppkey // {supp_off} != l_orderkey // {order_off}""")
    check("lineitem FK same-replica", bad == 0,
          f"{bad} cross-replica rows")

    # duplicate density must be LINEAR: exact-dup pair count scales ~rep
    def dup_pairs(d: str) -> int:
        return q(f"""SELECT coalesce(sum(n * (n - 1) / 2), 0) FROM (
            SELECT count(*) AS n FROM {pq(d, 'documents')}
            GROUP BY md5(text) HAVING count(*) > 1)""")

    ps, pd = dup_pairs(src), dup_pairs(dst)
    check("exact-dup pairs linear", ps * rep * 0.9 <= pd <= ps * rep * 1.1,
          f"{pd} vs {ps} x {rep} = {ps * rep} "
          f"(quadratic would be ~{ps * rep * rep})")

    # embeddings: sign-flip preserves the norm exactly
    drift = q(f"""SELECT max(abs(a.n - b.n)) FROM
        (SELECT vec_id % (SELECT count(*) FROM {pq(src, 'embeddings')})
                AS base_id,
                sqrt(list_sum(list_transform(embedding, x -> x * x))) AS n
         FROM {pq(dst, 'embeddings')}) a
        JOIN (SELECT vec_id AS base_id,
                sqrt(list_sum(list_transform(embedding, x -> x * x))) AS n
              FROM {pq(src, 'embeddings')}) b USING (base_id)""")
    check("embedding norms preserved", drift < 1e-4, f"max drift {drift}")

    # events: timestamps unchanged per replica (same min/max as source).
    # Encodings vary by testdata generation (TIMESTAMP(NANOS) pre-r6,
    # timestamp[us] now, raw int64 nanos in old GenScale replicas) —
    # normalize each side to integer epoch-µs by its OWN described type
    # (µs is the repo-wide oracle granularity anyway).
    def ts_us_expr(base: str) -> str:
        t = next(t for c, t, *_ in con.execute(
            f"DESCRIBE SELECT ts FROM {pq(base, 'events')}").fetchall()
            if c == "ts")
        return "ts // 1000" if t == "BIGINT" else "epoch_us(ts)"

    es, ed = ts_us_expr(src), ts_us_expr(dst)
    for agg in ("min", "max"):
        ts_s = q(f"SELECT {agg}({es}) FROM {pq(src, 'events')}")
        ts_d = q(f"SELECT {agg}({ed}) FROM {pq(dst, 'events')}")
        check(f"events ts {agg} fixed", int(ts_s) == int(ts_d),
              f"{ts_d} (want {ts_s} at us granularity)")

    print(f"\n{'ALL CHECKS PASS' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
