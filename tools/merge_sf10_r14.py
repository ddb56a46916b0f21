#!/usr/bin/env python3
"""Assemble the r14 single-run sf10 correctness record: merge the batch
outputs of tools/run_threepoint_r14.sh into CORRECTNESS_SF10.json with
single-binary provenance. Fails loudly if any inventory query is
missing a row, any stale extra row leaked in, or any row is red.
PROVENANCE_COMMIT must be set to the frozen binary's commit before the
merge (refuses a placeholder).
"""
import glob
import json
import os
import sys

COMMIT = os.environ.get("PROVENANCE_COMMIT", "")
if len(COMMIT) < 7:
    sys.exit("set PROVENANCE_COMMIT to the frozen binary's commit hash")

BATCHES = sorted(glob.glob("/root/repo/localdata/sf10_r14_*.json"))
if not BATCHES:
    sys.exit("no sf10_r14_*.json batch outputs found")

merged = {}
for p in BATCHES:
    d = json.load(open(p))
    for k, v in d.items():
        if k.startswith("_"):
            continue
        # a later batch never re-runs an earlier query; duplicates
        # would mean an ONLY/SKIP overlap bug in the runner script
        if k in merged:
            sys.exit(f"query {k} appears in two batches")
        merged[k] = v

# inventory completeness, against the engine run's oracle dump
oracles = json.load(
    open("/root/repo/localdata/verify_sf10_r14/oracle_sql.json"))
missing = sorted(set(oracles) - set(merged))
if missing:
    sys.exit(f"missing replay rows for: {missing}")
# extras mean a stale batch from an earlier sitting leaked in — its
# provenance would be foreign to this engine run's binary
extra = sorted(set(merged) - set(oracles))
if extra:
    sys.exit(f"extra replay rows not in this run's oracle dump: {extra}")

red = sorted(k for k, v in merged.items()
             if not (v.get("rows_match") and v.get("schema_match")
                     and v.get("hash_match")))
out = dict(sorted(merged.items()))
out["_provenance"] = {
    "note": (f"r14 single-run record: ONE full-inventory "
             f"({len(merged)}-query) Verify of the r14 binary (frozen "
             f"at commit {COMMIT} under localdata/frozen_r14) at the "
             "r11c-regenerated sf10 replica (localdata/sf10), oracles "
             "replayed in crash-isolated batches by "
             "tools/run_threepoint_r14.sh; no by-design exclusions"),
    "oracle_caps": ("ORACLE_MEMORY_LIMIT 24GB (56GB for "
                    "pipeline_distill_build), ORACLE_THREADS 16 (8 for "
                    "distill), ORACLE_TIMEOUT_SEC 2400; heavy replays "
                    "serial, DuckDB spill dir wiped between"),
    "batches": [p.split("/")[-1] for p in BATCHES],
    "n_queries": len(merged),
    "n_red": len(red),
    "red": red,
}
with open("/root/repo/CORRECTNESS_SF10.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"{len(merged)} rows, {len(red)} red -> CORRECTNESS_SF10.json")
if red:
    print("RED:", red)
    sys.exit(1)
