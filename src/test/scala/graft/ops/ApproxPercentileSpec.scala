package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** approx_percentile (agg_approx_percentile): the GK-sketch guarantees
  * that make it the unbounded-group percentile path at 100 TB —
  * (a) an ε = 1/accuracy RANK error bound that holds under any partial
  * merge order, and (b) exactness whenever a group's size fits the
  * summary uncompressed, independent of how the rows are partitioned.
  */
class ApproxPercentileSpec extends SparkSpec {

  private val ps = Seq(0.5, 0.9)

  test("estimates stay inside the epsilon rank envelope per group") {
    val acc = 100 // coarse on purpose: eps = 1% of the group
    val ev = Tables.events(spark, sf).select("event_type", "value").cache()
    val est = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(ps.map(lit): _*), lit(acc)).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val grouped = ev.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    grouped.foreach { case (g, vals) =>
      val n = vals.length
      ps.zipWithIndex.foreach { case (p, i) =>
        val v = est(g)(i)
        // rank of the estimate must be within ε·n of the target rank
        val rankLo = vals.count(_ < v)
        val rankHi = vals.count(_ <= v)
        val target = p * n
        val eps = math.max(1.0, n.toDouble / acc)
        assert(target >= rankLo - eps - 1 && target <= rankHi + eps + 1,
          s"$g p=$p: est $v rank [$rankLo,$rankHi] target $target ±$eps")
      }
    }
    ev.unpersist()
  }

  test("uncompressed summaries are exact under any partitioning") {
    val ev = Tables.events(spark, sf).select("event_type", "value")
    def run(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
      df.groupBy("event_type")
        .agg(percentile_approx(col("value"),
          array(ps.map(lit): _*), lit(1000000)).as("e"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val a = run(ev)
    val b = run(ev.repartition(17, col("value")))
    assert(a === b, "partition layout changed an uncompressed estimate")
    // and it equals the true discrete percentile
    val vals = ev.filter(col("event_type") === "click")
      .collect().map(_.getDouble(1)).sorted
    ps.zipWithIndex.foreach { case (p, i) =>
      val want = vals(math.ceil(p * vals.length).toInt - 1)
      assert(a("click")(i) === want)
    }
  }
}
