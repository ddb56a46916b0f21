package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Layout, Tables}
import graft.text.Dedup

/** Scale-path equivalence and plan-shape checks: prefix-filtered
  * similarity join, salted skew join, bucketed co-located join.
  */
class ScaleSpec extends SparkSpec {

  test("prefix-filtered jaccard equals the naive inverted-index join") {
    val docs = TextQueries.plantedDocs(spark, sf)
    val naive = Dedup.ngramJaccardPairs(docs, 3, 0.8, Int.MaxValue)
      .select("a_id", "b_id", "n_common")
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, 3, 0.8)
      .select("a_id", "b_id", "n_common")
    assert(naive.except(prefix).isEmpty, "prefix filter lost pairs")
    assert(prefix.except(naive).isEmpty, "prefix filter invented pairs")
  }

  test("prefix-filtered jaccard holds at a lower threshold too") {
    val docs = TextQueries.plantedDocs(spark, sf)
    val naive = Dedup.ngramJaccardPairs(docs, 3, 0.5, Int.MaxValue)
      .select("a_id", "b_id", "jaccard")
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, 3, 0.5)
      .select("a_id", "b_id", "jaccard")
    assert(naive.except(prefix).isEmpty && prefix.except(naive).isEmpty)
  }

  test("auto jaccard picks a plan and matches naive on both sides of the knob") {
    val docs = TextQueries.plantedDocs(spark, sf)
    val naive = Dedup.ngramJaccardPairs(docs, 3, 0.8, Int.MaxValue)
      .select("a_id", "b_id", "n_common")
    // force each branch by bracketing the volume limit
    val autoNaive = Dedup.ngramJaccardAuto(docs, 3, 0.8,
      naiveVolumeLimit = Long.MaxValue).select("a_id", "b_id", "n_common")
    val autoPrefix = Dedup.ngramJaccardAuto(docs, 3, 0.8,
      naiveVolumeLimit = 0L).select("a_id", "b_id", "n_common")
    assert(naive.except(autoNaive).isEmpty && autoNaive.except(naive).isEmpty)
    assert(naive.except(autoPrefix).isEmpty && autoPrefix.except(naive).isEmpty)
  }

  test("shuffle-shard output is balanced and a stable permutation") {
    import graft.SparkEntry
    val rows = SparkEntry.queries("pipeline_shuffle_shard")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val byShard = rows.groupBy(_._1).view.mapValues(_.length).toMap
    // 4 md5-nibble shards over n docs: binomial(n, 1/4) — at sf0.001's
    // 50 docs a 3σ envelope is ±~9; assert no shard is degenerate
    val n = rows.length
    assert(byShard.size === 4, byShard)
    byShard.values.foreach(c =>
      assert(math.abs(c - n / 4.0) < 4 * math.sqrt(n * 0.25 * 0.75) + 1,
        s"shard sizes skewed: $byShard"))
    // positions are a permutation of 1..size within each shard, and the
    // whole thing is deterministic across runs
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length))
    }
    val again = SparkEntry.queries("pipeline_shuffle_shard")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a uniform tail, joined to a small dim
    val left = spark.range(10000).select(lit(1L).as("k"),
        col("id").as("payload"))
      .unionAll(spark.range(500).select((col("id") % 50 + 2).as("k"),
        col("id").as("payload")))
    val right = spark.range(52).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("attr"))
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "attr")
    val salted = Skew.saltedJoin(left, right, Seq("k"), 8, col("payload"))
      .select("k", "payload", "attr")
    assert(plain.count() === salted.count())
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }

  test("adaptive salted join equals plain join in all three routing regimes") {
    import spark.implicits._
    val left = spark.range(10000).select(lit(1L).as("k"),
        col("id").as("payload"))
      .unionAll(spark.range(500).select((col("id") % 50 + 2).as("k"),
        col("id").as("payload")))
    val right = spark.range(52).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("attr"))
    val plain = left.join(right, Seq("k")).select("k", "payload", "attr")
    // mixed (hot key 1 flagged), all-cold (huge threshold),
    // all-hot (threshold 0)
    Seq(500L, Long.MaxValue / 2, 0L).foreach { thr =>
      val adaptive = Skew.adaptiveSaltedJoin(left, right, Seq("k"), 8,
          col("payload"), hotThreshold = thr, sampleFraction = 0.2)
        .select("k", "payload", "attr")
      withClue(s"threshold $thr:") {
        assert(plain.count() === adaptive.count())
        assert(plain.except(adaptive).isEmpty &&
          adaptive.except(plain).isEmpty)
      }
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    Layout.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey",
        "o_totalprice"),
      "orders_bkt", Seq("o_orderkey"), numBuckets = 8)
    Layout.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_bkt", Seq("l_orderkey"), numBuckets = 8)
    val joined = Layout.readTable(spark, "orders_bkt")
      .join(Layout.readTable(spark, "lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("l_quantity")).as("q"))
    joined.collect() // force execution so the adaptive plan finalizes
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles on the join key:\n$plan")
  }
}
