#!/usr/bin/env python3
"""Grade a BENCH_LOCAL.json against the per-class budgets (BASELINE.md
§round-4). Optionally merge two bench records query-wise min first — the
"clean pair" the verdicts grade:

    python3 tools/class_budget.py BENCH_LOCAL.json [BENCH_LOCAL2.json]

Exit 1 if any class exceeds its budget.
"""
import json
import sys

# query -> class. Every inventory query must appear in exactly one
# class; the script fails loudly on unknown/missing names so the map
# can't silently rot when the inventory grows.
CLASSES = {
    "scan/agg/window": [
        "agg_approx_distinct", "agg_approx_percentile", "agg_corr_exact",
        "agg_cube", "agg_distinct", "agg_groupby", "agg_grouping_sets",
        "agg_heavy_hitters", "agg_hll_sketch", "agg_percentile",
        "agg_pivot", "agg_rollup", "agg_stats", "agg_unpivot",
        "filter_scalar_subquery", "fn_array", "fn_base64", "fn_date",
        "fn_explode", "fn_json", "fn_math", "fn_path", "fn_regex",
        "fn_string", "fn_vector", "include_list_filter",
        "json_select_by_key", "envelope_project", "topic_regex_filter",
        "layout_zorder_slice", "log_scan", "profile_columns",
        "q_star_revenue", "sample_hash_split", "sample_stratified",
        "sample_weighted", "sample_weighted_group", "agg_countmin",
        "scan_parquet", "sort_limit", "sql_entry_topk", "top_k_agg",
        "top_k_payload", "top_k_per_group", "win_distribution",
        "win_first_last", "win_gaps_islands", "win_lead_lag",
        "win_moving_avg", "win_range_between", "win_rank",
        "win_running_sum",
    ],
    "joins/sets": [
        "join_asof", "join_asof_tolerance", "join_bloom_pruned",
        "join_broadcast", "join_bucketed_colocated", "join_full_outer",
        "join_left_anti", "join_left_outer", "join_left_semi",
        "join_null_safe", "join_range", "join_shuffle",
        "join_skew_adaptive", "join_skew_salted", "set_except",
        "set_intersect", "set_union",
    ],
    "cdc materialize/timeline": [
        "cdc_compact_state", "cdc_envelope", "cdc_envelope_avro",
        "cdc_evolved_history", "cdc_latest_state", "cdc_poison_pills",
        "cdc_scd2_as_of", "cdc_scd2_history",
        "cdc_snapshot_plus_incremental", "cdc_state_diff",
        "cdc_time_travel", "cdc_upsert_materialize",
    ],
    "streaming/state-store": [
        "cdc_multi_table_pipeline", "cdc_stream_dedup",
        "cdc_stream_enrich", "cdc_stream_evolving", "cdc_stream_pipeline",
        "cdc_stream_stateful",
        "stream_interval_join", "stream_late_audit",
        "stream_session_window", "stream_sliding_window",
        "stream_tumbling_window",
    ],
    "dedup family": [
        "dedup_clusters", "dedup_containment", "dedup_cross_corpus",
        "dedup_edit_verify", "dedup_embedding_cosine", "dedup_exact",
        "dedup_index_append", "dedup_index_compact",
        "dedup_index_describe", "dedup_index_probe",
        "dedup_minhash",
        "dedup_ngram_jaccard", "dedup_stream_ingest",
        "dedup_stream_maintain",
        "dedup_simhash", "text_substring_dedup", "text_index_search",
    ],
    "similarity/ANN": [
        "sim_ann_ivf", "sim_ann_ivf_append", "sim_ann_ivf_compact",
        "sim_ann_ivf_indexed",
        "sim_ann_ivf_pq", "sim_ann_ivf_pq_append",
        "sim_ann_ivf_pq_refined", "sim_ann_ivf_sq8",
        "sim_ann_ivf_sq8_append", "sim_ann_ivf_trained",
        "sim_ann_ivf_sharded",
        "sim_ann_lsh", "sim_cosine_topk", "sim_hybrid_search",
        "sim_index_describe",
        "sim_knn_join_cell", "sim_quantized_topk",
        "sim_stream_ivf_ingest", "sim_stream_ivf_maintain",
        "sim_stream_sq8_ingest", "sim_stream_pq_ingest",
    ],
    "text/multimodal per-row": [
        "mm_batch_embed", "mm_decode_avi", "mm_decode_jpeg",
        "mm_decode_meta",
        "mm_decode_real", "mm_decode_wav", "mm_video_framesum",
        "mm_dedup_binary",
        "mm_feature_extract", "mm_feature_extract_rgb",
        "mm_batch_embed_rgb",
        "mm_frame_sample", "mm_resize", "text_bm25",
        "text_entropy", "text_fingerprint", "text_histogram",
        "text_langid", "text_normalize", "text_quality",
        "text_redact_pii", "text_repetition", "text_tokens",
        "text_unigram_logprob", "text_vocab",
        "text_tfidf", "text_bigram_lm", "text_cooccur_pmi",
    ],
    "pipeline composites": [
        "pipeline_cdc_metrics", "pipeline_classifier_filter",
        "pipeline_clean_corpus", "pipeline_distill_build",
        "pipeline_curriculum_sample", "pipeline_decontaminate",
        "pipeline_dedup_apply", "pipeline_event_funnel",
        "pipeline_full_build", "pipeline_incremental_agg",
        "pipeline_media_build",
        "pipeline_mixture_sample", "pipeline_pack_sequences",
        "pipeline_semantic_decontaminate", "pipeline_shuffle_shard",
    ],
}

# BASELINE.md §round-4 budgets (seconds, clean sf0.1 run, min-of-2,
# noop sink). A breach means "investigate", a >2x breach means "real
# regression in that class".
#
# Round-7 amendment (BASELINE.md "Round-7 budget amendment"): classes
# that gained members after the round-4 derivation get +1.4x (mid of
# the original 1.3-1.5x band) the new members' clean min-of-2 warm
# time, so the floor keeps pricing the SAME work the original floors
# priced and a breach still means a regression, not inventory growth:
#   dedup family       25.0 + 1.4*(4.99 + 7.41)  -> 42.0
#     (dedup_index_append, dedup_stream_ingest — index-lifecycle
#      composites: full bucketed build + streamed appends + probe
#      inside one query)
#   similarity/ANN     12.0 + 1.4*(1.92 + 2.49 + 1.93) -> 21.0
#     (sim_ann_ivf_pq, sim_ann_ivf_pq_append, sim_ann_ivf_pq_refined
#      at the m=16/ksub=64 native-encode operating point)
#   pipeline composites 8.0 + 1.4*0.70           -> 9.0
#     (pipeline_semantic_decontaminate)
#
# Round-8 amendment (BASELINE.md "Round-8 budget amendment"): same
# 1.4x formula for the members that landed after the round-7
# derivation:
#   similarity/ANN     21.0 + 1.4*(1.19 + 2.01)   -> 25.5
#     (sim_ann_ivf_sq8 — committed clean warm 1.185 s;
#      sim_ann_ivf_sq8_append — r8 lifecycle parity, warm 2.014 s:
#      a build + append + segmented probe lifecycle in one query)
#   similarity/ANN     25.5 + 1.4*2.92            -> 29.6
#     (sim_stream_sq8_ingest — r8 streaming-ingest lifecycle parity:
#      base build + multi-micro-batch Structured Streaming appends +
#      manifest fan-out probe in one query, clean warm 2.919 s)
#   dedup family       42.0 + 1.4*5.94            -> 50.3
#     (dedup_index_compact — r8 compaction lifecycle: base build +
#      two appends + full-chain fold + post-compact probe in one
#      query, clean warm 5.942 s min-of-2)
#   similarity/ANN     29.6 + 1.4*3.57            -> 34.6
#     (sim_ann_ivf_compact — same lifecycle on the persisted IVF
#      family, clean warm 3.568 s min-of-2)
#   dedup family       50.3 + 1.4*(10.34 + 2.86) -> 68.8
#     (dedup_stream_maintain — self-maintaining streaming ingest:
#      base build + a multi-batch stream whose sink FOLDS the chain
#      mid-run + post-fold probe, the heaviest lifecycle composite
#      in the inventory, clean warm 10.335 s min-of-2;
#      dedup_index_describe — build + append + describe + the
#      corpus-recompute oracle side landing in-query, 2.860 s)
#   similarity/ANN     34.6 + 1.4*(5.15 + 1.41)  -> 43.8
#     (sim_stream_ivf_maintain 5.149 s, sim_index_describe 1.414 s
#      — same two verbs on the persisted IVF family)
#   dedup family       68.8 + 1.4*3.86           -> 74.2
#     (text_index_search — index-accelerated phrase grep: standing
#      shingle-index build + append + posting-pruned search in one
#      query, clean warm 3.858 s min-of-2)
#   similarity/ANN     43.8 + 1.4*4.63           -> 50.3
#     (sim_hybrid_search — both standing index families built then
#      probed + RRF fusion in one query, clean warm 4.632 s min-of-2)
#   pipeline composites 9.0 + 1.4*0.99           -> 10.4
#     (pipeline_classifier_filter — seed-set logistic distillation:
#      driver train on the bounded hash sample + full-corpus codegen
#      scoring + doc-join rollup, clean warm 0.993 s min-of-2)
#   pipeline composites 10.4 + 1.4*3.37          -> 15.1
#     (pipeline_distill_build — the four-stage embedding-space corpus
#      build: classifier gate + eval decontamination + cell-blocked
#      SemDeDup + rollup, two trained artifacts and two planted
#      families in one query, clean warm 3.372 s min-of-2)
#   similarity/ANN     50.3 + 1.4*3.94           -> 55.8
#     (sim_stream_pq_ingest — PQ streaming ingest, the last
#      family/verb lifecycle cell: base PQ build + multi-micro-batch
#      streamed codes-only appends + manifest fan-out probe in one
#      query, clean warm 3.941 s min-of-2)
# Round-9 amendment (BASELINE.md "Round-9"): same 1.4x formula:
#   text/multimodal     11.0 + 1.4*0.777          -> 12.1
#     (mm_decode_real — real-codec roundtrip: per-row PNG encode +
#      full ImageIO decode + raster checksum over the whole corpus.
#      First priced at its 2.465 s pre-review clean warm; re-priced
#      after the review pass found ImageIO's default stream cache
#      paying a temp-file round trip PER IMAGE — setUseCache(false)
#      took the query to 0.777 s clean warm, and the floor prices the
#      fixed form.)
# Round-10 amendment (BASELINE.md "Round-10"):
#   similarity/ANN     55.8 - 1.4*0.68           -> 54.8
#     (sim_knn_join DEMOTED out of the driver-run inventory — r9
#      verdict item 2: the deliberately-quadratic demonstrator now
#      lives in Bench's knn extras + QueryInventorySpec, so its
#      priced share (committed r9 warm 0.68 s) leaves the floor with
#      the query.)
#   text/multimodal     12.1 + 1.4*0.51          -> 12.8
#     (mm_decode_jpeg — real JPEG roundtrip through the same
#      partition-batched seam as mm_decode_real: per-row JPEG encode
#      at quality 1.0 + full in-JDK ImageIO decode + raster checksum
#      over the whole corpus, clean warm 0.513 s min-of-2.)
# Round-11 amendment (BASELINE.md "Round-11"):
#   streaming/state-store 28.0 + 1.4*8.43        -> 39.8
#     (cdc_stream_evolving — LIVE mid-stream schema evolution: the
#      feed Avro-encoded under three writer schemas + one poison
#      version, streamed one slice per trigger through the registry
#      gate with dead-letter quarantine, then the merged-read-schema
#      materialization — four real micro-batches with per-commit cost
#      plus the wire encode, clean warm 8.428 s min-of-2.)
#   text/multimodal     12.8 + 1.4*(0.92 + 1.98 + 1.70) -> 19.2
#     (the r11 audio/video real-codec trio — mm_decode_wav: per-row
#      16-bit PCM WAV build + full javax.sound decode + sample
#      checksum + zero-crossings; mm_decode_avi: per-row AVI/MJPEG
#      container build + RIFF demux + full ImageIO decode of every
#      frame; mm_video_framesum: same demux decoding only every 2nd
#      frame, exploded per frame. Clean min-of-2 at sf0.1: 0.915,
#      1.981, 1.703 s — measured on a sitting whose serial proxy ran
#      1.51x SLOWER than the r11-close record's, so the floor is
#      conservative.)
#   pipeline composites 15.1 + 1.4*0.93          -> 16.4
#     (pipeline_media_build — the multimodal corpus-build composite:
#      one partition-batched digest+real-decode pass, corrupt-media
#      gate over planted truncations, digest-keyed exact dedup,
#      survivor pixel-stat rollup; clean min-of-2 0.927 s at sf0.1 on
#      the same slow sitting.)
# Round-11c amendment (BASELINE.md "Round-11c"): same 1.4x formula for
# the corpus-statistics pack:
#   scan/agg/window     32.0 + 1.4*(0.35 + 0.10 + 0.43)  -> 33.2
#     (agg_countmin — one 4x256 CMS exchange row + exact top-20
#      refinement; sample_weighted — shuffle-free A-ExpJ top-k;
#      sample_weighted_group — per-group A-ExpJ via WindowGroupLimit.
#      Clean warm at sf0.1 (proxy-1.0 sitting): 0.35 / 0.10 / 0.43 s.)
#   text/multimodal     19.2 + 1.4*(0.89 + 1.11 + 1.12) -> 23.6
#     (text_tfidf — two corpus passes + WindowGroupLimit top-3;
#      text_bigram_lm — lag-window bigrams + corpus-LM join back;
#      text_cooccur_pmi — eligible-vocab-gated doc_id self-join.
#      Clean warm at sf0.1 (proxy-1.0 sitting): 0.89 / 1.11 / 1.12 s.)
# Round-13 RATCHET (VERDICT r12 item 7): the additive amendments above
# had drifted the TOTAL floor to 280.0 while the r12 driver record
# measured 185.8 (0.66x) — a 1.5x regression would have passed the
# gate. Floors reset to 1.25x the r12 committed driver record per
# class (BENCH_r12, the graded sitting — its host proxy was typical;
# the 1.25x headroom is the documented host-variance allowance), plus
# the historical 1.4x formula for the r13-new members:
#   similarity/ANN     39.25*1.25 + 1.4*0.89      -> 50.3
#     (sim_ann_ivf_sharded — beyond-cap sharded codebook + persisted
#      build + pruned probe, clean warm 0.887 s min-of-2 at sf0.1)
#   text/multimodal    18.40*1.25 + 1.4*(0.91+0.96) -> 25.6
#     (mm_feature_extract_rgb 0.905 s, mm_batch_embed_rgb 0.957 s —
#      multi-band luma kernels over the RGB fixture family)
# A uniform +30% on an r12-shaped record now breaches EVERY class
# (1.30 > 1.25); the old floors would have absorbed it silently.
BUDGETS = {
    "scan/agg/window": 31.5,
    "joins/sets": 15.5,
    "cdc materialize/timeline": 15.6,
    "streaming/state-store": 25.7,
    "dedup family": 58.2,
    "similarity/ANN": 50.3,
    "text/multimodal per-row": 25.6,
    "pipeline composites": 13.7,
}


def main() -> None:
    recs = [json.load(open(p)) for p in sys.argv[1:]] or [
        json.load(open("BENCH_LOCAL.json"))]
    queries = dict(recs[0]["queries"])
    for r in recs[1:]:
        for q, v in r["queries"].items():
            queries[q] = min(queries.get(q, v), v)

    mapped = {q for qs in CLASSES.values() for q in qs}
    unknown = set(queries) - mapped
    missing = mapped - set(queries)
    if unknown:
        print(f"UNMAPPED queries (add to CLASSES): {sorted(unknown)}")
    if missing:
        print(f"MISSING from bench record: {sorted(missing)}")

    fails = 0
    total = 0.0
    print(f"{'class':28s} {'n':>3s} {'sec':>8s} {'budget':>8s}")
    for cls, qs in CLASSES.items():
        t = sum(queries.get(q, 0.0) for q in qs)
        total += t
        ok = t <= BUDGETS[cls]
        if not ok:
            fails += 1
        print(f"{cls:28s} {len(qs):3d} {t:8.1f} {BUDGETS[cls]:8.1f}"
              f"  {'OK' if ok else 'OVER'}")
    print(f"{'TOTAL':28s} {sum(len(q) for q in CLASSES.values()):3d} "
          f"{total:8.1f} {sum(BUDGETS.values()):8.1f}")
    sys.exit(1 if (fails or unknown or missing) else 0)


if __name__ == "__main__":
    main()
