#!/bin/bash
# r12 single-binary sf10 correctness record: ONE clean full-inventory
# (170-query) engine run of the r12 binary at the existing sf10 replica
# (localdata/sf10 — regenerated in r11c, unchanged since), then the
# DuckDB oracle replay in crash-isolated batches (heavy replays serial,
# spill dir wiped between), then a merge into CORRECTNESS_SF10.json via
# tools/merge_sf10_r12.py.
# Launch: setsid nohup tools/run_sf10_r12.sh > localdata/sf10_r12.log 2>&1 & disown
set -u
cd /root/repo
OUT=localdata/verify_sf10_r12
# Frozen classes MUST live under localdata/ (project memory: /tmp
# freezes produced stale-on-write copies); refuse a /tmp arg.
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

if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "=== engine: full-inventory Verify at sf10 (r12 binary) ==="
  rm -rf "$OUT"
  # shellcheck disable=SC2086
  java -Xmx24g $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" \
    graft.Verify /root/repo/localdata/sf10 "$OUT" 2>&1 \
    | grep -E "\[verify\]" || true
  echo "=== engine verify rc=$? ==="
fi

mkdir -p localdata/oracle_scratch_r12
cd localdata/oracle_scratch_r12
export ORACLE_TIMEOUT_SEC=2400

# heavy replays (serial, one name or family per batch). r12 adds the
# real-pixel multimodal pair: both unnest a 475-position pixel grid per
# document (~2.4e8 rows at sf10), serial out of caution.
HEAVY="dedup_containment dedup_simhash dedup_clusters pipeline_dedup_apply \
pipeline_pack_sequences join_range join_asof_tolerance \
pipeline_semantic_decontaminate \
sim_knn_join_cell sim_hybrid_search text_substring_dedup \
text_bigram_lm text_cooccur_pmi mm_feature_extract mm_batch_embed"
IVF1="sim_ann_ivf,sim_ann_ivf_trained,sim_ann_ivf_indexed,sim_ann_ivf_append"
IVF2="sim_ann_ivf_compact,sim_ann_ivf_pq,sim_ann_ivf_pq_append,sim_ann_ivf_pq_refined"
IVF3="sim_stream_ivf_ingest,sim_stream_ivf_maintain,sim_ann_ivf_sq8,sim_ann_ivf_sq8_append"
IVF4="sim_stream_sq8_ingest,sim_stream_pq_ingest"

SKIPLIST=$(echo $HEAVY | tr ' ' ',')",$IVF1,$IVF2,$IVF3,$IVF4,pipeline_distill_build"

echo "=== bulk replay (everything light) ==="
rm -rf .tmp
ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_SKIP="$SKIPLIST" \
  python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 "/root/repo/$OUT" \
  /root/repo/localdata/sf10_r12_bulk.json
echo "=== bulk rc=$? ==="

i=1
for batch in "$IVF1" "$IVF2" "$IVF3" "$IVF4"; do
  rm -rf .tmp
  echo "=== ivf batch $i: $batch ==="
  ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_ONLY="$batch" \
    python3 /root/repo/tools/check_oracle.py \
    /root/repo/localdata/sf10 "/root/repo/$OUT" \
    /root/repo/localdata/sf10_r12_ivf$i.json
  echo "=== ivf batch $i rc=$? ==="
  i=$((i+1))
done

for q in $HEAVY; do
  rm -rf .tmp
  echo "=== heavy: $q ==="
  ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_ONLY="$q" \
    python3 /root/repo/tools/check_oracle.py \
    /root/repo/localdata/sf10 "/root/repo/$OUT" \
    "/root/repo/localdata/sf10_r12_$q.json"
  echo "=== $q rc=$? ==="
done

rm -rf .tmp
echo "=== distill (56GB/8t — the one oversized replay) ==="
ORACLE_MEMORY_LIMIT=56GB ORACLE_THREADS=8 ORACLE_ONLY=pipeline_distill_build \
  python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 "/root/repo/$OUT" \
  /root/repo/localdata/sf10_r12_distill.json
echo "=== distill rc=$? ==="
rm -rf .tmp
echo SF10_R12_DONE
