#!/bin/bash
# r12: full-inventory (170-query) sf10 bench of the r12 binary — the
# sitting that shows the training-memo effect (r11 burned ~1027 s of
# 1853.6 s retraining identical IVF/PQ/SQ8 artifacts per query; the
# memo gives the inventory build-once/probe-many). Frozen classes
# REQUIRED under localdata/ (project memory: /tmp freezes went stale).
# sim_knn_join (the demoted quadratic demonstrator) stays gated off as
# in r11. SPARK_GRAFT_BENCH_REF points at the committed BENCH_SF10 so
# the per-reference outlier retry is live at this scale too.
# Launch: setsid nohup tools/run_sf10_bench_r12.sh > localdata/bench_sf10_r12.log 2>&1 & disown
set -u
cd /root/repo
CLASSES=${1:-/root/repo/localdata/frozen_r12/classes}
case "$CLASSES" in /tmp/*) echo "refusing /tmp classes dir: $CLASSES (use localdata/)"; exit 1;; esac
[ -d "$CLASSES" ] || { echo "classes dir missing: $CLASSES"; exit 1; }
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
SPARK_GRAFT_BENCH_REF=/root/repo/BENCH_SF10.json \
SPARK_GRAFT_BENCH_OUT=/root/repo/localdata/bench_sf10_r12.json \
  java -Xmx28g $ADDOPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench
echo "=== bench rc=$? ==="
