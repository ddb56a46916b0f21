#!/bin/bash
set -u
# NOTE: batches 1-2 here supersede tools/run_sf10_r9_replay.sh (same
# output paths) — re-running BOTH clobbers artifacts with redundant work.
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
# fresh engine runs for the schema-extended distill + the new real-codec query
cd /root/repo
rm -rf localdata/verify_sf10_extra
SPARK_GRAFT_ONLY=pipeline_distill_build,mm_decode_real SPARK_DRIVER_MEM=24g \
java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Xmx24g \
  graft.Verify /root/repo/localdata/sf10 localdata/verify_sf10_extra 2>&1 | grep -E "\[verify\]"
echo "=== extra engine verify done ==="
cd /root/repo/localdata/oracle_scratch
rm -rf .tmp
ORACLE_MEMORY_LIMIT=56GB ORACLE_THREADS=8 python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 /root/repo/localdata/verify_sf10_extra \
  /root/repo/localdata/sf10_extra.json
echo "=== extra rc=$? ==="
rm -rf .tmp
echo R9B_DONE
