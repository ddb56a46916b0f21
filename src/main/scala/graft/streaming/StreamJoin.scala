package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — click→purchase attribution as Spark's
  * canonical watermarked join: one logical definition that runs on both
  * planes (batch DataFrames ignore `withWatermark`; streaming ones use
  * it to bound join state).
  *
  * Semantics: each purchase matches the same user's clicks in
  * `[purchase_ts − maxDelay, purchase_ts]`. In streaming execution the
  * time-interval condition is what lets Spark EVICT state: a click
  * older than the right watermark minus `maxDelay` can never join a
  * future purchase, so per-key state is bounded by the delay window ×
  * arrival rate — the only formulation of a stream-stream join that
  * survives an unbounded stream. Without the interval bound Spark must
  * keep every row forever (and warns so).
  *
  * Scale shape: both sides shuffle once on `user_id` (co-partitioned
  * state store); batch execution plans the identical equi-join +
  * range-predicate shape, so the DuckDB oracle for
  * `stream_interval_join` verifies the same logical answer the
  * streaming runtime produces (parity asserted in StreamJoinSpec).
  */
object StreamJoin {

  /** Inputs need (`user_id`, `event_id`, `ts: timestamp`). Output: one
    * row per (click, purchase) attribution pair.
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       maxDelay: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", maxDelay)
    val p = purchases.select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", maxDelay)
    c.join(p,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"interval $maxDelay"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }
}
