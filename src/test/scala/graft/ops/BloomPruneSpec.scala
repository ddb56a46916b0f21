package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.sources.Tables

class BloomPruneSpec extends SparkSpec {

  private def fact = Tables.lineitem(spark, sf)
    .select("l_suppkey", "l_extendedprice")
  private def dim = Tables.supplier(spark, sf)
    .filter(col("s_nationkey") === 3)
    .select("s_suppkey", "s_name")

  test("bloom-pruned join equals the plain equi-join") {
    val pruned = BloomPrune.bloomPrunedJoin(fact, dim,
      "l_suppkey", "s_suppkey")
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
    assert(pruned.exceptAll(plain).isEmpty &&
           plain.exceptAll(pruned).isEmpty,
      "bloom-pruned join diverged from the plain join")
  }

  test("the filter prunes pre-shuffle and keeps every true match") {
    val items = math.max(1L, dim.count())
    val bytes = dim
      .select(Native.bloomAgg(col("s_suppkey"), items).as("bf"))
      .head().getAs[Array[Byte]](0)
    val total = fact.count()
    val passed = fact
      .filter(Native.bloomMightContain(bytes, col("l_suppkey")))
    // no false negatives: every fact row with a real dim partner passes
    val trueMatches = fact.join(dim,
      col("l_suppkey") === col("s_suppkey"), "left_semi")
    assert(trueMatches.exceptAll(passed).isEmpty,
      "bloom filter dropped a true match")
    // and with a ~1/25-selective dim the pass-through is a small
    // fraction — this is the shuffle-bytes saving at scale
    assert(passed.count() < total / 2,
      s"filter pruned nothing: ${passed.count()}/$total")
  }

  test("the bloom filter build is one tiny aggregate (binary bytes)") {
    val bytes = dim
      .select(Native.bloomAgg(col("s_suppkey"), 1000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    assert(bytes.nonEmpty && bytes.length < (1 << 20),
      s"unexpected filter size ${bytes.length}")
  }
}
