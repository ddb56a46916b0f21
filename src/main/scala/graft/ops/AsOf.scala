package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join as a first-class operator.
  *
  * Spark has no asof join; the classic formulations are a non-equi range
  * join (quadratic per key, a nested-loop at scale) or a bucketed
  * approximation. This one is linear: union both sides into one
  * key-partitioned timeline, sort right-before-left at equal
  * timestamps, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over a running frame — ONE shuffle on the
  * key, one per-partition sort, any key cardinality.
  *
  * Contract: for each left row, the most recent right row of the same
  * key with `right.ts <= left.ts` (ties: the right row wins, i.e. a
  * right row at exactly left.ts matches; among equal-ts right rows the
  * largest `tieBreak` wins). With `toleranceUs`, matches older than
  * `left.ts - toleranceUs` are nulled out — the frame is
  * [ts - tolerance, ts], TimescaleDB/Pandas `merge_asof` semantics.
  */
object AsOf {

  /** @param rightPayload right columns carried onto left rows (must not
    *                     collide with left column names)
    * @param tieBreak     right column ordering equal-ts right rows
    *                     (larger = preferred); timestamps alone are the
    *                     tiebreak when None
    * @return left.* ++ rightPayload ++ `asof_ts` (matched right ts, null
    *         when no match in tolerance)
    */
  def joinLatest(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 rightPayload: Seq[String],
                 tieBreak: Option[String] = None,
                 toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs).cast("long"))
      .withColumn("__side", lit(1))
    val r = right.select(
        keys.map(col) ++ Seq(
          col(rightTs).cast("long").as("__ts"),
          lit(0).as("__side"),
          struct(col(rightTs).cast("long").as("__rts") +:
            rightPayload.map(col): _*).as("__rp"),
          tieBreak.map(col).getOrElse(lit(0L)).cast("long").as("__tie")): _*)
    // union the two roles; columns missing on either side become null
    val combined = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      // right (__side 0) sorts before left at equal __ts ⇒ inclusive
      // match; among equal-ts right rows the largest __tie is last seen
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = combined
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTolerance = toleranceUs match {
      case Some(t) => col("__m").isNotNull &&
        (col("__ts") - col("__m.__rts")) <= t
      case None => col("__m").isNotNull
    }
    val keep: Seq[Column] = leftCols.map(col) ++
      rightPayload.map(p => when(inTolerance, col(s"__m.$p")).as(p)) :+
      when(inTolerance, col("__m.__rts")).as("asof_ts")
    matched.select(keep: _*)
  }
}
