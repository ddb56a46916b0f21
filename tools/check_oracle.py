#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

Reads <verifyOutDir>/oracle_sql.json, registers every testdata table by
bare name in DuckDB, runs each oracle, and compares against the Spark
result parquet (columns sorted by name, exact value equality; floats
compared exactly — the queries are built so both engines produce
identical doubles). With jsonOut, also writes one row PER QUERY —
including failures with err populated (ADVICE r5: a correctness
artifact that only contains its green rows reads as all-green).
"""
import json, sys, glob, os, time, threading
import duckdb

# ORACLE_TIMEOUT_SEC=N bounds each DuckDB replay (0 = unbounded, the
# default and the driver's behavior). Some oracles are deliberately
# quadratic-ish replays of cell-blocked engine work (the IVF family's
# v CROSS JOIN cents assignment is Θ(n·nlist)); at replica scales far
# above the driver's sf0.01 gate they can dominate wall-clock. A
# timeout is reported as its own outcome — NOT a correctness failure:
# the engine produced its result; only the replay was cut short.
ORACLE_TIMEOUT = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0"))

sf_dir, out_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
def fresh_con():
    """A connection with caps + table views registered. A failed query
    (OOM/spill) can poison DuckDB's buffer-pool accounting for the
    connection's remaining lifetime — every later allocation then OOMs
    at kilobyte sizes — so the main loop reconnects after any error
    instead of carrying the wounded connection forward."""
    c = duckdb.connect()
    # Replica-scale replays can blow the host: an unbounded DuckDB
    # happily grows to ~50 GB and a quadratic-ish oracle spills >60 GB
    # of temp. Optional caps keep a retry pass survivable (unset =
    # driver behavior).
    if os.environ.get("ORACLE_MEMORY_LIMIT"):
        c.execute(f"SET memory_limit='{os.environ['ORACLE_MEMORY_LIMIT']}'")
    if os.environ.get("ORACLE_THREADS"):
        c.execute(f"SET threads={int(os.environ['ORACLE_THREADS'])}")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        # driver testdata is one flat file per table; GenScale replicas
        # are Spark-written directories — glob the part files then
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        sel = "*"
        if name == "events":
            # driver events.ts is TIMESTAMP(NANOS), which DuckDB
            # truncates to a µs TIMESTAMP on read; GenScale replicas
            # carry the same instant as an INT64 nano-long (the Spark-4
            # read-path form). Reproduce DuckDB's truncation so
            # epoch_us(ts) oracles see the identical µs timestamp
            # either way.
            (_, ts_type) = next(
                (cn, t) for cn, t, *_ in c.execute(
                    f"DESCRIBE SELECT * FROM '{src}'").fetchall()
                if cn == "ts")
            if ts_type == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        c.execute(f"CREATE VIEW {name} AS SELECT {sel} FROM '{src}'")
    return c

con = fresh_con()

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# Resume/partition filters for replica-scale runs (a 156-query sf10
# replay is hours of DuckDB; a crash mid-run must not force a full
# redo). ORACLE_ONLY=a,b runs a subset; ORACLE_SKIP=a,b excludes.
if os.environ.get("ORACLE_ONLY"):
    only = {q.strip() for q in os.environ["ORACLE_ONLY"].split(",")}
    oracle = {k: v for k, v in oracle.items() if k in only}
if os.environ.get("ORACLE_SKIP"):
    skip = {q.strip() for q in os.environ["ORACLE_SKIP"].split(",")}
    oracle = {k: v for k, v in oracle.items() if k not in skip}
n_pass = n_fail = n_timeout = 0
report = {}
for name, sql in sorted(oracle.items()):
    row = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    report[name] = row
    try:
        # Timer.cancel() cannot stop a callback that already started:
        # an oracle finishing within ms of the deadline can leave a
        # stale con.interrupt() that lands on the NEXT statement (the
        # engine-parquet read) and would turn a pass into a spurious
        # fail. `fired` marks a timer-originated interrupt so any
        # statement it hits is retried once instead of failing.
        timer = None
        fired = threading.Event()
        if ORACLE_TIMEOUT > 0:
            def _interrupt():
                fired.set()
                con.interrupt()
            timer = threading.Timer(ORACLE_TIMEOUT, _interrupt)
            timer.start()
        t0 = time.time()
        timed_out = False
        try:
            exp = con.execute(sql).fetchdf()
        except duckdb.InterruptException:
            if fired.is_set():
                timed_out = True
            else:
                # stale interrupt from a prior query's timer, not this
                # oracle exceeding its own deadline — replay once. THIS
                # iteration's timer is still live, so the real deadline
                # can fire mid-retry: that is a timeout, not an ERROR.
                try:
                    exp = con.execute(sql).fetchdf()
                except duckdb.InterruptException:
                    if not fired.is_set():
                        raise  # two stale interrupts in a row: genuine anomaly
                    timed_out = True
        finally:
            if timer:
                timer.cancel()
        if timed_out:
            row["err"] = f"oracle_timeout(>{ORACLE_TIMEOUT:.0f}s)"
            print(f"TIMEOUT {name}: oracle replay exceeded "
                  f"{ORACLE_TIMEOUT:.0f}s (engine result present)",
                  flush=True)
            n_timeout += 1
            # an interrupted replay can leak buffer reservations —
            # same hygiene as the error path (see fresh_con)
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
            continue
        row["oracle_sec"] = round(time.time() - t0, 1)
        got_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        try:
            got = con.execute(got_sql).fetchdf()
        except duckdb.InterruptException:
            # This iteration's timer is already cancelled by the time the
            # engine parquet is read, and cancel() cannot stop an in-flight
            # callback — so ANY interrupt landing here is stale (this
            # iteration's raced callback or a prior iteration's). The
            # engine result exists on disk either way: retry once.
            got = con.execute(got_sql).fetchdf()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        row["spark_rows"], row["oracle_rows"] = len(got), len(exp)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            row["err"] = f"columns {list(got.columns)} != {list(exp.columns)}"
            n_fail += 1
            continue
        row["schema_match"] = True
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            row["err"] = f"rows {len(got)} != {len(exp)}"
            n_fail += 1
            continue
        row["rows_match"] = True
        # exact cell-wise compare (NaN == NaN)
        diff_cols = []
        for c in exp.columns:
            a, b = exp[c], got[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                diff_cols.append((c, int((~eq).sum())))
        if diff_cols:
            print(f"FAIL {name}: value diffs {diff_cols}")
            for c, _ in diff_cols[:2]:
                mask = ~((exp[c] == got[c]) | (exp[c].isna() & got[c].isna()))
                print("  oracle:", exp[mask].head(3).to_dict("records"))
                print("  spark :", got[mask].head(3).to_dict("records"))
            row["err"] = f"value diffs {diff_cols}"
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            row["hash_match"] = True
            n_pass += 1
    except Exception as e:
        print(f"ERROR {name}: {e}", flush=True)
        row["err"] = str(e)
        n_fail += 1
        # see fresh_con: don't carry a possibly-poisoned connection
        try:
            con.close()
        except Exception:
            pass
        con = fresh_con()
if json_out:
    # Carry the Verify run's provenance (SPARK_GRAFT_SKIP/ONLY) into the
    # report so a partial replica artifact distinguishes "skipped by
    # design" from "never ran" (ADVICE r8).
    skipped_path = f"{out_dir}/skipped.json"
    if os.path.exists(skipped_path):
        report["_provenance"] = json.load(open(skipped_path))
    with open(json_out, "w") as f:
        json.dump(report, f, indent=1)
# Oracle-side runtime telemetry (r10 verdict item 6): the CHECKER, not
# the engine, is the next scale bottleneck (sf10 needed crash-isolated
# batches with 2400 s timeouts). Surface the top-5 slowest replays in
# every run so a growing oracle is visible before it eats a replica
# record; tools/oracle_growth.py compares two records for superlinear
# growth across sf points.
slow = sorted(((r.get("oracle_sec"), q) for q, r in report.items()
               if isinstance(r, dict) and r.get("oracle_sec")),
              reverse=True)[:5]
if slow:
    print("slowest oracles: " +
          ", ".join(f"{q}={s:.1f}s" for s, q in slow))
tmo = f", {n_timeout} oracle-timeout" if n_timeout else ""
print(f"\n{n_pass} pass, {n_fail} fail{tmo}")
sys.exit(1 if n_fail else 0)
