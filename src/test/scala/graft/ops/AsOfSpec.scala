package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** AsOf.joinLatest vs the brute-force semantic definition (non-equi
  * join + argmax), on the real event stream. The brute force is the
  * quadratic plan the operator exists to avoid — at sf0.001 it's cheap
  * enough to be the oracle.
  */
class AsOfSpec extends SparkSpec {

  private def purchases: DataFrame = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("p_ts"))

  private def clicks: DataFrame = Tables.events(spark, sf)
    .filter(col("event_type") === "click")
    .select(col("user_id"), unix_micros(col("ts")).as("c_ts"),
      col("event_id").as("click_id"), col("value").as("click_value"))

  /** Brute force: all (purchase, click) pairs with c_ts <= p_ts (and
    * within tolerance), keep max (c_ts, click_id).
    */
  private def bruteForce(tolUs: Option[Long]): Set[(Long, Option[Long])] = {
    val joined = purchases.as("p").join(clicks.as("c"),
      col("p.user_id") === col("c.user_id") &&
        col("c.c_ts") <= col("p.p_ts") &&
        tolUs.map(t => col("p.p_ts") - col("c.c_ts") <= t)
          .getOrElse(lit(true)),
      "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("c_ts").desc_nulls_last, col("click_id").desc_nulls_last)
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("click_id"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
  }

  private def viaAsOf(tolUs: Option[Long]): Set[(Long, Option[Long])] =
    AsOf.joinLatest(purchases, clicks, Seq("user_id"), "p_ts", "c_ts",
        rightPayload = Seq("click_id", "click_value"),
        tieBreak = Some("click_id"), toleranceUs = tolUs)
      .select(col("event_id"), col("click_id"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet

  test("asof join equals brute-force argmax (no tolerance)") {
    val got = viaAsOf(None)
    assert(got === bruteForce(None))
    assert(got.exists(_._2.isDefined), "no purchase matched any click")
  }

  test("asof join equals brute-force argmax (1 hour tolerance)") {
    val tol = Some(3600000000L)
    val got = viaAsOf(tol)
    assert(got === bruteForce(tol))
    assert(got.exists(_._2.isEmpty),
      "tolerance never excluded a match — test not discriminating")
  }

  test("left rows and count are preserved (left-outer semantics)") {
    val out = AsOf.joinLatest(purchases, clicks, Seq("user_id"),
      "p_ts", "c_ts", Seq("click_id"), Some("click_id"), None)
    assert(out.count() === purchases.count())
    assert(out.columns.toSeq ===
      Seq("event_id", "user_id", "p_ts", "click_id", "asof_ts"))
  }
}
