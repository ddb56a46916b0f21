#!/bin/bash
# r11: the third point on the full-inventory wall-clock scale curve
# (r10 verdict item 2). Runs graft.Bench over ALL 159 queries at the
# sf10 replica from a FROZEN copy of the classes (so the working tree
# can keep compiling), with the quadratic knn-naive extra gated off
# via SPARK_GRAFT_SKIP (its Σ|block|² time at sf10 is the exact
# blow-up the r10 demotion removed; the cell form still runs).
# Launch: setsid nohup tools/run_sf10_bench_r11.sh > localdata/bench_sf10_r11.log 2>&1 & disown
set -u
cd /root/repo
CLASSES=${1:-/tmp/graft_frozen_r11/classes}
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# shellcheck disable=SC2086
SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf10 \
SPARK_GRAFT_SKIP=sim_knn_join \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_SF10.json \
  java -Xmx28g $ADDOPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench
echo "=== bench rc=$? ==="
