package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.ops.HeavyHitters
import graft.sources.Tables
import graft.text.TextAnalysis

/** Misra-Gries sketch: the no-miss guarantee under every partitioning
  * (merge order), the estimate error bound, and the two-pass
  * heavy-hitter exactness.
  */
class FreqSketchSpec extends SparkSpec {

  private def toks = Tables.documents(spark, sf)
    .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    .select(xxhash64(col("tok")).as("h"))

  private lazy val exact: Map[Long, Long] = toks
    .groupBy("h").count().collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap
  private lazy val n: Long = exact.values.sum

  private def sketchItems(parts: Int, cap: Int): Map[Long, Long] = {
    val df = if (parts == 1) toks.coalesce(1) else toks.repartition(parts)
    df.agg(Native.freqSketch(col("h"), cap).as("sk"))
      .select(explode(col("sk.items")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("every item over n/(capacity+1) survives, for any partitioning") {
    val cap = 64
    val bound = n / (cap + 1)
    val mustKeep = exact.filter(_._2 > bound).keySet
    assert(mustKeep.nonEmpty, "test data has no heavy items — weak test")
    Seq(1, 4, 13).foreach { parts =>
      val kept = sketchItems(parts, cap).keySet
      assert(mustKeep.subsetOf(kept),
        s"parts=$parts lost ${mustKeep.diff(kept).size} heavy items")
    }
  }

  test("estimates obey est ≤ true and est ≥ true − n/(capacity+1)") {
    val cap = 64
    val slack = n / (cap + 1)
    sketchItems(7, cap).foreach { case (item, est) =>
      val t = exact.getOrElse(item, 0L)
      assert(est <= t, s"overestimate for $item: $est > $t")
      assert(est >= t - slack, s"underestimate beyond bound: $est < $t - $slack")
    }
  }

  test("two-pass heavy hitters equals exact GROUP BY/HAVING, " +
       "even under sketch pressure") {
    val rows = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    // capacity 100 is just above the 1/0.01 guarantee line — the
    // sketch sheds counters constantly, the result must not change
    val hh = HeavyHitters.heavyHitters(rows, col("tok"),
      minFraction = 0.01, capacity = 100)
    val total = rows.count()
    val threshold = math.ceil(0.01 * total).toLong
    val plain = rows.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("tok").as("item"), col("cnt"))
    assert(hh.exceptAll(plain).isEmpty && plain.exceptAll(hh).isEmpty,
      "two-pass heavy hitters diverged from exact")
    assert(plain.count() > 0, "no heavy hitters at 1% — weak test")
  }

  test("guarantee precondition is enforced") {
    val rows = toks.select(col("h").as("tok"))
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(rows, col("tok"),
        minFraction = 0.001, capacity = 100)
    }
  }

  test("SQL registration: graft_freq_sketch resolves") {
    Native.install(spark)
    toks.createOrReplaceTempView("freq_toks")
    val row = spark.sql(
      "SELECT graft_freq_sketch(h, 32) AS sk FROM freq_toks")
      .select(col("sk.total"), size(col("sk.items"))).head()
    assert(row.getLong(0) == n && row.getInt(1) <= 32)
  }
}
