#!/bin/bash
set -u
cd /root/repo/localdata/oracle_scratch
export ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_TIMEOUT_SEC=2400
rm -rf .tmp
ORACLE_ONLY=dedup_containment python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 /root/repo/localdata/verify_sf10_r9 \
  /root/repo/localdata/sf10_r9_containment.json
echo "=== containment rc=$? ==="
rm -rf .tmp
ORACLE_ONLY=dedup_simhash python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 /root/repo/localdata/verify_sf10_r9 \
  /root/repo/localdata/sf10_r9_simhash.json
echo "=== simhash rc=$? ==="
rm -rf .tmp
ORACLE_ONLY=join_range,pipeline_pack_sequences,pipeline_dedup_apply,dedup_clusters \
  python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 /root/repo/localdata/verify_sf10_r9 \
  /root/repo/localdata/sf10_r9_rest.json
echo "=== rest rc=$? ==="
rm -rf .tmp
echo R9_REPLAY_DONE
