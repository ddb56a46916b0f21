#!/bin/bash
# sf10 oracle replay of the IVF/pipeline family (engine results already
# regenerated post-5ffb845 in localdata/verify_sf10_ivf). Batched so a
# DuckDB temp-spill death cannot take out the whole pass; scratch temp
# dir wiped between batches (10 of the 19 r8 failures were disk-full).
set -u
cd /root/repo/localdata/oracle_scratch
export ORACLE_MEMORY_LIMIT=24GB ORACLE_THREADS=16 ORACLE_TIMEOUT_SEC=1800
B1="sim_ann_ivf,sim_ann_ivf_trained,sim_ann_ivf_indexed,sim_ann_ivf_append"
B2="sim_ann_ivf_compact,sim_ann_ivf_pq,sim_ann_ivf_pq_append,sim_ann_ivf_pq_refined"
B3="sim_stream_ivf_ingest,sim_stream_ivf_maintain,sim_hybrid_search,sim_knn_join_cell"
B4="pipeline_semantic_decontaminate,pipeline_distill_build"
i=1
for batch in "$B1" "$B2" "$B3" "$B4"; do
  rm -rf .tmp
  echo "=== batch $i: $batch ==="
  ORACLE_ONLY="$batch" python3 /root/repo/tools/check_oracle.py \
    /root/repo/localdata/sf10 /root/repo/localdata/verify_sf10_ivf \
    /root/repo/localdata/sf10_ivf_batch$i.json
  echo "=== batch $i rc=$? ==="
  i=$((i+1))
done
rm -rf .tmp
echo ALL_BATCHES_DONE
