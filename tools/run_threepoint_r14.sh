#!/bin/bash
# r14 three-point record, ALL SIX LEGS from ONE frozen binary
# (localdata/frozen_r14). Same serial protocol as r13's script.
# r14 delta: bench heap 48g -> 32g — the query-boundary block hygiene
# (QueryPack.releaseRetainedBlocks) fixed the cumulative
# localCheckpoint accumulation behind the r13 28g OOM, and the full
# sf10 leg was proven green at 32g pre-freeze. Verify keeps 40g (last
# proven value). Phases:
#   1. bench sf0.1  (testdata/sf0.1,  ref BENCH_LOCAL.json)
#   2. bench sf1    (localdata/sf1,   ref BENCH_SF1.json)
#   3. bench sf10   (localdata/sf10,  ref BENCH_SF10.json)
#   4. verify+oracle sf0.1  -> localdata/sf01_r14_correctness.json
#   5. verify sf10 + batched oracle replay -> localdata/sf10_r14_*.json
#      (merge into CORRECTNESS_SF10.json via tools/merge_sf10_r14.py)
# Launch: setsid nohup tools/run_threepoint_r14.sh > localdata/threepoint_r14.log 2>&1 & disown
set -u
cd /root/repo
CLASSES=${1:-/root/repo/localdata/frozen_r14/classes}
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

bench() { # $1 sfdir $2 ref $3 out
  # shellcheck disable=SC2086
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_BENCH_REF="$2" \
  SPARK_GRAFT_BENCH_OUT="$3" \
    java -Xmx32g $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench
  echo "=== bench $1 rc=$? ==="
}

if [ ! -f localdata/bench_sf01_r14.json ]; then
  echo "=== 1/5 bench sf0.1 (frozen) ==="
  bench /root/testdata/sf0.1 /root/repo/BENCH_LOCAL.json \
    /root/repo/localdata/bench_sf01_r14.json
fi
if [ ! -f localdata/bench_sf1_r14.json ]; then
  echo "=== 2/5 bench sf1 (frozen) ==="
  bench /root/repo/localdata/sf1 /root/repo/BENCH_SF1.json \
    /root/repo/localdata/bench_sf1_r14.json
fi
if [ ! -f localdata/bench_sf10_r14.json ]; then
  echo "=== 3/5 bench sf10 (frozen) ==="
  bench /root/repo/localdata/sf10 /root/repo/BENCH_SF10.json \
    /root/repo/localdata/bench_sf10_r14.json
fi

if [ ! -f localdata/verify_sf01_r14/oracle_sql.json ]; then
  echo "=== 4/5 verify + oracle sf0.1 (frozen) ==="
  rm -rf localdata/verify_sf01_r14
  # shellcheck disable=SC2086
  java -Xmx40g $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" \
    graft.Verify /root/testdata/sf0.1 localdata/verify_sf01_r14 2>&1 \
    | grep -E "\[verify\]" || true
  echo "=== sf0.1 verify done ==="
fi
if [ ! -f localdata/sf01_r14_correctness.json ]; then
  ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 \
    python3 tools/check_oracle.py /root/testdata/sf0.1 \
    localdata/verify_sf01_r14 localdata/sf01_r14_correctness.json
  echo "=== sf0.1 oracle rc=$? ==="
fi

OUT=localdata/verify_sf10_r14
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "=== 5/5 verify sf10 (frozen) ==="
  rm -rf "$OUT"
  # shellcheck disable=SC2086
  java -Xmx40g $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" \
    graft.Verify /root/repo/localdata/sf10 "$OUT" 2>&1 \
    | grep -E "\[verify\]" || true
  echo "=== sf10 engine verify done ==="
fi

mkdir -p localdata/oracle_scratch_r14
cd localdata/oracle_scratch_r14
export ORACLE_TIMEOUT_SEC=2400

# r14 additions to the r12 batch plan: the rgb pixel pair joins the
# HEAVY serial list (same 475-position unnest as their r12 siblings,
# 3 modular band terms per luma); sim_ann_ivf_sharded gets its OWN
# batch (nlist=1563 at sf10 — the assignment replay is ~1.5x an IVF1
# member's).
HEAVY="dedup_containment dedup_simhash dedup_clusters pipeline_dedup_apply \
pipeline_pack_sequences join_range join_asof_tolerance \
pipeline_semantic_decontaminate \
sim_knn_join_cell sim_hybrid_search text_substring_dedup \
text_bigram_lm text_cooccur_pmi mm_feature_extract mm_batch_embed \
mm_feature_extract_rgb mm_batch_embed_rgb"
IVF1="sim_ann_ivf,sim_ann_ivf_trained,sim_ann_ivf_indexed,sim_ann_ivf_append"
IVF2="sim_ann_ivf_compact,sim_ann_ivf_pq,sim_ann_ivf_pq_append,sim_ann_ivf_pq_refined"
IVF3="sim_stream_ivf_ingest,sim_stream_ivf_maintain,sim_ann_ivf_sq8,sim_ann_ivf_sq8_append"
IVF4="sim_stream_sq8_ingest,sim_stream_pq_ingest"
IVF5="sim_ann_ivf_sharded"

SKIPLIST=$(echo $HEAVY | tr ' ' ',')",$IVF1,$IVF2,$IVF3,$IVF4,$IVF5,pipeline_distill_build"

echo "=== bulk replay (everything light) ==="
rm -rf .tmp
ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_SKIP="$SKIPLIST" \
  python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 "/root/repo/$OUT" \
  /root/repo/localdata/sf10_r14_bulk.json
echo "=== bulk rc=$? ==="

i=1
for batch in "$IVF1" "$IVF2" "$IVF3" "$IVF4" "$IVF5"; do
  rm -rf .tmp
  echo "=== ivf batch $i: $batch ==="
  ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_ONLY="$batch" \
    python3 /root/repo/tools/check_oracle.py \
    /root/repo/localdata/sf10 "/root/repo/$OUT" \
    /root/repo/localdata/sf10_r14_ivf$i.json
  echo "=== ivf batch $i rc=$? ==="
  i=$((i+1))
done

for q in $HEAVY; do
  rm -rf .tmp
  echo "=== heavy: $q ==="
  ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_ONLY="$q" \
    python3 /root/repo/tools/check_oracle.py \
    /root/repo/localdata/sf10 "/root/repo/$OUT" \
    "/root/repo/localdata/sf10_r14_$q.json"
  echo "=== $q rc=$? ==="
done

rm -rf .tmp
echo "=== distill (56GB/8t — the one oversized replay) ==="
ORACLE_MEMORY_LIMIT=56GB ORACLE_THREADS=8 ORACLE_ONLY=pipeline_distill_build \
  python3 /root/repo/tools/check_oracle.py \
  /root/repo/localdata/sf10 "/root/repo/$OUT" \
  /root/repo/localdata/sf10_r14_distill.json
echo "=== distill rc=$? ==="
rm -rf .tmp
echo THREEPOINT_R13_DONE
