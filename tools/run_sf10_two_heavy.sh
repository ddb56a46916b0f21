#!/bin/bash
set -u
cd /root/repo/localdata/oracle_scratch
export ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_TIMEOUT_SEC=1800
rm -rf .tmp
ORACLE_ONLY=pipeline_distill_build python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 /root/repo/localdata/verify_sf10_ivf \
  /root/repo/localdata/sf10_distill.json
echo "=== distill rc=$? ==="
rm -rf .tmp
ORACLE_ONLY=pipeline_dedup_apply python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 /root/repo/localdata/verify_sf10 \
  /root/repo/localdata/sf10_dedupapply.json
echo "=== dedupapply rc=$? ==="
rm -rf .tmp
echo TWO_HEAVY_DONE
