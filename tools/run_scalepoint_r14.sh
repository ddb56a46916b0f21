#!/bin/bash
# r14 fourth scale point for the standing-artifact paths (VERDICT r13
# item 4): the append/probe/merge curves stopped at sf10 (two-point
# sf1->sf10 for the index families). One more fixed-delta point turns
# the 100 TB extrapolation into a three-point curve:
#   1. GenScale SUBSET at rep=300 (sf30: documents+embeddings+events
#      only — no point replicating 60M lineitem rows to scale a text
#      index; precedent: the r6 sf10 subset run, BASELINE.md)
#   2. ScaleProbe sf30  (shingle index + IVF fixed-delta rows)
#   3. CdcProbe sf30    (30M-event merge throughput + time-travel reads)
#   4. ShardScaleProbe n=2^21 (beyond-cap sharded IVF at 2M vectors,
#      nlist 8192 — the n>=10^6 probe-form point the verdict asks for)
# Launch: setsid nohup tools/run_scalepoint_r14.sh > localdata/scalepoint_r14.log 2>&1 & disown
set -u
cd /root/repo
CLASSES=${1:-/root/repo/localdata/r14_wip_classes}
case "$CLASSES" in /tmp/*) echo "refusing /tmp classes dir: $CLASSES"; exit 1;; esac
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
J() { # $1 xmx, rest: main + args
  local XMX="$1"; shift
  # shellcheck disable=SC2086
  java -Xmx"$XMX" $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" "$@"
}

if [ ! -d localdata/sf30sub/events.parquet ]; then
  echo "=== 1/4 genscale sf30 subset (docs+emb+events, rep=300) ==="
  rm -rf localdata/sf30sub
  J 24g graft.tools.GenScale /root/testdata/sf0.1 localdata/sf30sub 300 \
    documents,embeddings,events
  echo "=== genscale rc=$? ==="
fi

echo "=== 2/4 ScaleProbe sf30 ==="
J 32g graft.tools.ScaleProbe localdata/sf30sub sf30 \
  2> localdata/scaleprobe_sf30.err | tee localdata/scaleprobe_sf30.json
echo "=== scaleprobe rc=$? ==="

echo "=== 3/4 CdcProbe sf30 ==="
J 32g graft.tools.CdcProbe localdata/sf30sub sf30 \
  2> localdata/cdcprobe_sf30.err | tee localdata/cdcprobe_sf30.json
echo "=== cdcprobe rc=$? ==="

echo "=== 4/4 ShardScaleProbe n=2^21 ==="
J 32g graft.tools.ShardScaleProbe 2097152 64 2048 32 \
  2> localdata/shardprobe_2m.err | tee localdata/shardprobe_2m.json
echo "=== shardprobe rc=$? ==="
rm -rf /tmp/graft_shardprobe_2097152_64 /tmp/graft_scaleprobe_*
echo SCALEPOINT_R14_DONE
