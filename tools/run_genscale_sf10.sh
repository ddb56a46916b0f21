#!/bin/bash
# Regenerate the full sf10 replica (rep=100 from the BASE sf0.1 dir —
# never chain replicas; see GenScale scaladoc) for the r11c unified
# 170-query correctness + bench records.
set -u
cd /root/repo
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
rm -rf localdata/sf10
# shellcheck disable=SC2086
java -Xmx24g $ADDOPENS -Dspark.ui.enabled=false \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.GenScale /root/testdata/sf0.1 localdata/sf10 100
echo "=== genscale rc=$? ==="
