package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers (SURVEY.md §7.2 "Skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * is for the pathological key whose post-split partitions still
  * overwhelm one task (a single hot PK receiving a huge share of a
  * change stream, a boilerplate shingle). Salting trades an `saltFactor`×
  * replication of the (small) build side for an even spread of the
  * (skewed) probe side.
  */
object Skew {

  /** Inner equi-join with the LEFT side's hot keys spread over
    * `saltFactor` sub-keys and the RIGHT side replicated to match.
    * Result equals `left.join(right, keys)` exactly.
    *
    * `saltSource` must be a left-side column (any non-key payload works,
    * uniqueness not required) — the salt is derived by hashing it, so
    * the join stays deterministic, no `rand()`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, saltSource: Column): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
