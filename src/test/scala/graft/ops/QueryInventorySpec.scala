package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Whole-inventory smoke + physical-plan shape assertions.
  *
  * Correctness against DuckDB is the driver's gate (tools/check_oracle.py);
  * here we pin the *plans*: the scale properties SURVEY.md §7.2 demands
  * (broadcast for dims, pushdown into parquet, no cartesian products).
  */
class QueryInventorySpec extends SparkSpec {

  test("inventory size is pinned — a silent drop or unplanned add " +
      "fails loudly (update BOTH this pin and SURVEY §2.B on change)") {
    assert(SparkEntry.queries.size === 173)
  }

  test("every declared query runs and yields rows at sf0.001") {
    val empties = Seq("join_left_anti") // may legitimately be empty per SF
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"query $name:") {
        assert(n >= 0)
        if (!empties.contains(name)) assert(n > 0, s"$name returned 0 rows")
      }
    }
  }

  test("EVERY query has an oracle — no rows-only entries remain") {
    // the trained/indexed IVF pair renders its oracle AT RUN TIME
    // (centroid literals) — run them so the registration is visible
    Seq("sim_ann_ivf_trained", "sim_ann_ivf_indexed", "sim_knn_join_cell",
        "sim_ann_ivf_sharded",
        "sim_ann_ivf_append", "sim_ann_ivf_compact",
        "sim_stream_ivf_ingest", "sim_stream_ivf_maintain",
        "sim_index_describe",
        "sim_ann_ivf_pq",
        "sim_ann_ivf_pq_append", "sim_ann_ivf_pq_refined",
        "sim_ann_ivf_sq8", "sim_ann_ivf_sq8_append",
        "sim_stream_sq8_ingest", "sim_stream_pq_ingest",
        "pipeline_semantic_decontaminate", "text_index_search",
        "sim_hybrid_search", "pipeline_classifier_filter",
        "pipeline_distill_build")
      .foreach(n => SparkEntry.queries(n)(spark, sf).count())
    val effective = SparkEntry.oracleSql.keySet ++
      DynamicOracle.snapshot.keySet
    // the allowlist died in r6: md5-portable conversions (r3) moved
    // dedup/LSH, centroid pinning (r4) moved the IVF pair, and
    // within-bound accuracy contracts (r6) moved the sketch trio —
    // so a query without an oracle is now simply a bug
    assert((SparkEntry.queries.keySet -- effective) === Set.empty[String])
    // and no orphaned oracles for queries that don't exist
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet)
      === Set.empty[String])
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("join_broadcast actually broadcasts the dimension tables") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("scan_parquet pushes filters into the parquet scan") {
    val p = plan("scan_parquet")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate") && p.contains("l_quantity"))
  }

  test("scan_parquet prunes columns (ReadSchema has only 4 fields)") {
    val p = plan("scan_parquet")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"), readSchema)
  }

  test("event-time windows are pushed into the events parquet scan") {
    val p = plan("cdc_upsert_materialize")
    val scanLines = p.linesIterator
      .filter(l => l.contains("events.parquet") && l.contains("PushedFilters"))
      .toSeq
    assert(scanLines.nonEmpty, p)
    assert(scanLines.forall(_.matches(".*PushedFilters: \\[.*ts.*\\].*")),
      s"ts bound not pushed:\n${scanLines.mkString("\n")}")
  }

  test("top_k_agg runs as a partial-combinable object hash aggregate") {
    val p = plan("top_k_agg")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_graft_topk"),
      "map-side partial aggregation missing — every row would cross the exchange")
  }

  test("join_skew_salted replicates the build side via Generate") {
    assert(plan("join_skew_salted").contains("Generate"))
  }

  test("sim_ann_ivf: no Exchange before candidate ranking") {
    // round-2 contract: cell assignment is a per-row argmax over literal
    // centroids — the corpus side must reach the (broadcast) probe join
    // through scan→project→generate only, with NO shuffle. The only
    // Exchanges allowed are the per-query ranking shuffle and the final
    // presentation sort.
    val p = plan("sim_ann_ivf")
    assert(!p.contains("CartesianProduct") && !p.contains("crossJoin"), p)
    // corpus side feeds the broadcast join directly: between the
    // embeddings scan and the BroadcastHashJoin there is no Exchange
    val lines = p.linesIterator.toSeq
    val scanIdx = lines.lastIndexWhere(_.contains("embeddings.parquet"))
    val joinIdx = lines.lastIndexWhere(_.contains("BroadcastHashJoin"))
    assert(joinIdx >= 0 && scanIdx > joinIdx, p)
    val between = lines.slice(joinIdx, scanIdx)
    assert(!between.exists(l => l.contains("Exchange") &&
      !l.contains("BroadcastExchange")),
      s"corpus shuffled before candidate ranking:\n${between.mkString("\n")}")
  }

  test("q_star_revenue: dims broadcast; date and region slices reach " +
       "their scans") {
    val p = plan("q_star_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    val scans = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(scans.exists(l => l.contains("orders.parquet") &&
      l.contains("o_orderdate")), "date window not pushed to orders scan")
    assert(scans.exists(l => l.contains("region.parquet") &&
      l.contains("r_name")), "region slice not pushed to region scan")
  }

  test("join_bloom_pruned: the might_contain filter sits on the fact " +
       "side before the join") {
    val p = plan("join_bloom_pruned")
    assert(p.contains("might_contain"), p)
    // the filter must sit directly on the lineitem (fact) scan branch,
    // so pruning happens before rows move anywhere. The fact branch
    // prints first; its might_contain Filter precedes its FileScan.
    // (Catalyst also infers a copy onto the dim side via the join
    // constraint — harmless, the dim is tiny.)
    val lines = p.linesIterator.toSeq
    val factScan = lines.indexWhere(_.contains("lineitem.parquet"))
    val filterIdx = lines.indexWhere(_.contains("might_contain"))
    assert(filterIdx >= 0 && factScan > filterIdx,
      s"bloom filter not between fact scan and join:\n$p")
  }

  test("sim_quantized_topk: corpus streams through one scan into a " +
       "broadcast join — no pre-join shuffle") {
    val p = plan("sim_quantized_topk")
    val lines = p.linesIterator.toSeq
    val scanIdx = lines.lastIndexWhere(_.contains("embeddings.parquet"))
    val joinIdx = lines.lastIndexWhere(_.contains("BroadcastNestedLoopJoin"))
    assert(joinIdx >= 0 && scanIdx > joinIdx, p)
    val between = lines.slice(joinIdx, scanIdx)
    assert(!between.exists(l => l.contains("Exchange") &&
      !l.contains("BroadcastExchange")),
      s"corpus shuffled before quantized scoring:\n${between.mkString("\n")}")
  }

  test("top_k_payload runs as a partial-combinable graft_topk_rows") {
    val p = plan("top_k_payload")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_graft_topk_rows"),
      "map-side partial aggregation missing for payload top-k")
  }

  test("pipeline_clean_corpus: quality filter precedes the dedup shuffle") {
    val p = plan("pipeline_clean_corpus")
    // survivor selection must be a semi join, not a full join
    assert(p.contains("LeftSemi"), p)
  }

  test("join_bucketed_colocated joins with zero Exchange") {
    // disable auto-broadcast: at test SF the small side would broadcast
    // (also fine), hiding the co-location the layout is FOR at scale
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val p = plan("join_bucketed_colocated")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p)
      assert(p.contains("Bucketed: true"), p)
      // bucketed layout satisfies the join's distribution: the only
      // exchange allowed is the final presentation sort
      val joinSection = p.linesIterator
        .dropWhile(l => !l.contains("Join")).toSeq
      assert(!joinSection.exists(l => l.contains("Exchange") &&
        !l.contains("BroadcastExchange")),
        s"bucketed join still shuffles:\n${joinSection.mkString("\n")}")
    } finally spark.conf.set(key, prev)
  }

  // the naive kNN join is a spec/bench extra since r10, not an
  // inventory query — resolve its plan through the demonstrator Q
  private def naivePlan: String =
    SimilarityQueries.knnJoinNaive.fn(spark, sf)
      .queryExecution.executedPlan.toString

  test("sim_knn_join: per-query top-k limits below the ranking shuffle") {
    // Spark 4 pushes a WindowGroupLimit under the rank window's
    // Exchange: each map task keeps a per-group heap of k rows, so the
    // shuffle moves O(groups × k), not the full blocked pair set —
    // the property that makes a blocked kNN join survive 100 TB.
    val p = naivePlan
    val lines = p.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(l => l.contains("Exchange") &&
      !l.contains("BroadcastExchange"))
    val partialLimitIdx = lines.lastIndexWhere(_.contains("WindowGroupLimit"))
    assert(partialLimitIdx > exchangeIdx && exchangeIdx >= 0,
      s"no partial WindowGroupLimit below the shuffle:\n$p")
  }

  test("sim_knn_join_cell: cell assignment adds no exchange; partial " +
       "top-k still below the ranking shuffle") {
    // the cell refinement must stay a zero-shuffle per-row argmax over
    // literal centroids: same Exchange count as the unrefined join
    // (join key exchange + rank exchange + presentation sort), plus
    // the same WindowGroupLimit-below-Exchange partial top-k.
    val p = plan("sim_knn_join_cell")
    val lines = p.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(l => l.contains("Exchange") &&
      !l.contains("BroadcastExchange"))
    val partialLimitIdx = lines.lastIndexWhere(_.contains("WindowGroupLimit"))
    assert(partialLimitIdx > exchangeIdx && exchangeIdx >= 0,
      s"no partial WindowGroupLimit below the shuffle:\n$p")
    val cellExchanges = lines.count(l =>
      l.contains("Exchange hashpartitioning"))
    val plainExchanges = naivePlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(cellExchanges <= plainExchanges + 1,
      s"cell refinement added shuffles: $cellExchanges vs " +
        s"$plainExchanges in the plain join:\n$p")
  }

  test("the cell-refined kNN join stays the documented default and " +
       "stays oracled; the naive form stays OUT of the inventory as " +
       "a demonstrator") {
    // r4 verdict: sim_knn_join is the one deliberately-quadratic plan
    // (15.1× time at 3× data measured); r9 verdict item 2 demoted it
    // out of the driver-run inventory so no scale record needs a
    // by-design exclusion. This pins the new arrangement: the DEFAULT
    // constant names the cell form and the cell form IS an inventory
    // query with a rendered oracle; the naive form is NOT in
    // SparkEntry.queries but survives as the demonstrator Q (plan
    // pinned above, timed by Bench's knn extras, still documented in
    // PLANS.md through Plans.demonstrators with its fence note) —
    // so neither a rename, a re-promotion, nor a regenerated PLANS.md
    // can silently change the story.
    assert(SimilarityQueries.knnJoinDefault == "sim_knn_join_cell")
    assert(SimilarityQueries.knnJoinScaleDemonstrator == "sim_knn_join")
    assert(SparkEntry.queries.contains(SimilarityQueries.knnJoinDefault))
    assert(!SparkEntry.queries.contains(
      SimilarityQueries.knnJoinScaleDemonstrator),
      "the quadratic demonstrator crept back into the inventory")
    assert(SimilarityQueries.knnJoinNaive.name ==
      SimilarityQueries.knnJoinScaleDemonstrator)
    assert(SimilarityQueries.knnJoinNaive.oracle.nonEmpty,
      "the demonstrator must stay hash-verifiable at spec level")
    assert(graft.Plans.demonstrators.contains(
      SimilarityQueries.knnJoinScaleDemonstrator))
    SparkEntry.queries(SimilarityQueries.knnJoinDefault)(spark, sf).count()
    assert(DynamicOracle.snapshot.contains(SimilarityQueries.knnJoinDefault),
      "the default kNN join lost its rendered oracle")
    val naiveNote = graft.Plans.notes.getOrElse(
      SimilarityQueries.knnJoinScaleDemonstrator, "")
    assert(naiveNote.contains("SCALE-DEMONSTRATOR") &&
      naiveNote.contains(SimilarityQueries.knnJoinDefault),
      "PLANS.md note no longer fences the naive kNN join")
    assert(graft.Plans.notes.contains(SimilarityQueries.knnJoinDefault),
      "PLANS.md note no longer documents the default kNN join")
    assert(graft.Plans.selected.contains(SimilarityQueries.knnJoinDefault))
  }

  test("the demoted naive kNN join still hash-matches its oracle " +
       "semantics via the cell form on shared pairs") {
    // the demonstrator keeps its oracle SQL, but the driver no longer
    // replays it — pin its SEMANTICS in-spec instead: rank-1 neighbors
    // from the naive all-pairs form must agree with the cell-refined
    // default wherever the cell form found the same neighbor set
    // (same label AND same trained cell ⇒ identical candidate
    // ordering). A full-equality check would re-prove the recall
    // trade, not correctness; rank-1-in-same-cell is the invariant
    // that is exactly true by construction.
    import org.apache.spark.sql.functions.col
    val naive = SimilarityQueries.knnJoinNaive.fn(spark, sf)
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id"), col("cosine"))
    val cell = SparkEntry.queries("sim_knn_join_cell")(spark, sf)
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id").as("cell_neighbor"),
        col("cosine").as("cell_cosine"))
    val joined = naive.join(cell, Seq("vec_id")).cache()
    try {
      val n = joined.count()
      assert(n > 0, "no shared rank-1 rows to compare")
      // where both forms picked the same neighbor, the cosine must be
      // bit-identical (same kernel); and the naive rank-1 cosine can
      // never be WORSE than the cell form's (naive searches a superset)
      val mismatch = joined.filter(
        col("neighbor_id") === col("cell_neighbor") &&
          col("cosine") =!= col("cell_cosine")).count()
      assert(mismatch === 0, "shared neighbors disagree on cosine")
      val worse = joined.filter(col("cosine") < col("cell_cosine")).count()
      assert(worse === 0,
        "naive all-pairs rank-1 lost to the pruned cell form")
    } finally { joined.unpersist(); () }
  }

  test("text_bm25: query-term postings filter sits on the token " +
       "explode, before any exchange") {
    val p = plan("text_bm25")
    val lines = p.linesIterator.toSeq
    // the tf branch: Filter(tok IN ...) must appear between the
    // documents scan and the first aggregate exchange above it
    val filterIdx = lines.indexWhere(l => l.contains("Filter") &&
      l.contains("tok"))
    assert(filterIdx >= 0, s"no token filter in plan:\n$p")
    // everything above the token filter on this branch may aggregate,
    // but the filter itself must not consume a shuffled input: no
    // Exchange between the filter and its scan below
    val scanBelow = lines.drop(filterIdx)
      .indexWhere(_.contains("documents.parquet"))
    assert(scanBelow >= 0, s"token filter not over the documents scan:\n$p")
    val between = lines.slice(filterIdx, filterIdx + scanBelow)
    assert(!between.exists(l => l.contains("Exchange") &&
      !l.contains("BroadcastExchange")),
      s"postings filtered only after a shuffle:\n${between.mkString("\n")}")
  }

  test("pipeline_shuffle_shard: exactly one data-bearing exchange " +
       "(the shard key), no global sort below the window") {
    val p = plan("pipeline_shuffle_shard")
    val lines = p.linesIterator.toSeq
    val dataExchanges = lines.count(l => l.contains("Exchange hashpartitioning"))
    assert(dataExchanges == 1,
      s"expected one hash exchange on shard, got $dataExchanges:\n$p")
  }

  test("cdc_scd2_history: lead and row_number share one window pass") {
    val p = plan("cdc_scd2_history")
    // a single Window node computes both; two passes would print two
    val windows = p.linesIterator.count(l => l.trim.startsWith("Window") ||
      l.contains(") Window"))
    // formatted plans list the node once in the tree and once in the
    // details section
    assert(windows <= 2, s"SCD2 runs multiple window passes:\n$p")
  }

  test("pipeline_full_build: eval set broadcasts, removal is an anti " +
       "join, no full-corpus self-join") {
    val p = plan("pipeline_full_build")
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("LeftAnti"), p)
    // the quality gate reaches the documents scan: n_chars bounds are
    // pushable base-column predicates
    val scans = p.linesIterator.filter(l =>
      l.contains("documents.parquet") && l.contains("PushedFilters")).toSeq
    assert(scans.exists(_.contains("n_chars")),
      s"quality gate not pushed to the scan:\n${scans.mkString("\n")}")
  }

  test("dedup_containment: prefix ranking keeps a bounded per-doc " +
       "heap below the window shuffle") {
    // the corpus-wide literal prefix bound lets Catalyst insert a
    // WindowGroupLimit (Partial) under the window's Exchange, so the
    // per-doc canonical sort never shuffles the full shingle multiset.
    // The inventory query cost-chooses the naive plan at this SF, so
    // assert on the prefix form directly (what sf1+ runs).
    val p = graft.text.Dedup.containmentPairsPrefix(
      graft.sources.Tables.documents(spark, sf), 3, 0.9)
      .queryExecution.executedPlan.toString
    val partial = p.linesIterator.exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial"))
    assert(partial,
      s"no partial WindowGroupLimit under the prefix window:\n$p")
  }

  test("no query plans a cartesian product") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      withClue(s"query $name:") {
        assert(!p.contains("CartesianProduct"), s"$name has a cartesian product")
      }
    }
  }
}
