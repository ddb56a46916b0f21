package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

/** Exact heavy hitters at unbounded cardinality — the two-pass sketch
  * pattern:
  *
  *  1. SKETCH: one Misra-Gries pass (O(capacity) state, map-side
  *     partials, a single tiny merge) yields a candidate SUPERSET. The
  *     guarantee: any item with true frequency > n/(capacity+1) is in
  *     the sketch, for every merge order — so with
  *     minFraction > 1/(capacity+1), no true heavy hitter can be
  *     missed.
  *  2. VERIFY: exact counts for candidates only — the groupBy shuffles
  *     just the rows whose item is in the (≤ capacity) candidate set,
  *     not every distinct key. Sketch false positives die here.
  *
  * The result is therefore EXACT (≡ `GROUP BY … HAVING count ≥ ⌈s·n⌉`,
  * which is the DuckDB oracle for `agg_heavy_hitters`) while never
  * holding more than `capacity` counters anywhere — contrast the plain
  * groupBy, which shuffles the full distinct-key space. Items are
  * sketched via `xxhash64`, so the item column can be any type; a hash
  * collision only adds a false candidate, which the verify pass
  * removes.
  */
object HeavyHitters {

  /** Items (any type, as a Column) whose exact frequency is ≥
    * ⌈minFraction · n⌉, with that exact count. `capacity` must satisfy
    * minFraction > 1/(capacity+1) for the no-miss guarantee.
    */
  def heavyHitters(rows: DataFrame, item: Column,
                   minFraction: Double, capacity: Int = 1024)
      : DataFrame = {
    require(minFraction > 1.0 / (capacity + 1),
      s"minFraction=$minFraction below the sketch guarantee " +
        s"1/(capacity+1)=${1.0 / (capacity + 1)}; raise capacity")
    val hashed = rows.select(item.as("item"),
      xxhash64(item).as("__h"))
    val sk = hashed
      .agg(Native.freqSketch(col("__h"), capacity).as("sk"))
      .select(col("sk.total").as("total"),
        col("sk.items.item").as("cands"))
      .head()
    val total = sk.getLong(0)
    val cands = sk.getSeq[Long](1)
    val threshold = math.ceil(minFraction * total).toLong
    hashed
      .filter(col("__h").isin(cands: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
