package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** DataSketches HLL (agg_hll_sketch): accuracy envelope vs exact
  * distinct, and the property that makes sketches THE 100 TB distinct
  * path — merging per-slice sketches gives exactly the whole-set
  * sketch's answer (re-aggregatable partials, no raw re-scan).
  */
class SketchSpec extends SparkSpec {

  test("hll estimate within 5% of exact distinct per group") {
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: est ${est(k)} vs exact $n")
    }
  }

  test("union of per-slice sketches equals the whole-set sketch") {
    val ev = Tables.events(spark, sf)
      .withColumn("slice", pmod(col("event_id"), lit(4)))
    val whole = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .head().getLong(0)
    val merged = ev.groupBy("slice")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    assert(merged === whole)
  }
}
