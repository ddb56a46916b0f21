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

  /** TARGETED salting — the production skew pattern: detect hot keys on
    * a sample, salt ONLY those, join the cold majority normally, union.
    * Blanket salting (above) taxes every key with build-side
    * replication; here the tax applies to exactly the keys that need
    * it. Result ≡ `left.join(right, keys)` regardless of which keys the
    * sample flags (detection tunes the PHYSICAL route only), which is
    * what the oracle checks.
    *
    * `hotThreshold` is the estimated per-key row count (sample count /
    * sampleFraction) above which a key is treated as hot. The hot-key
    * list is tiny by construction (keys above a volume floor) and is
    * broadcast to split both sides.
    */
  def adaptiveSaltedJoin(left: DataFrame, right: DataFrame,
                         keys: Seq[String], saltFactor: Int,
                         saltSource: Column, hotThreshold: Long,
                         sampleFraction: Double = 0.1): DataFrame = {
    // The hot list is referenced by THREE joins below; materialize it to
    // a LocalRelation (it is tiny by construction — keys above a volume
    // floor) so the sample+aggregate runs exactly once, not once per
    // consuming join.
    val hotPlan = left.sample(sampleFraction, 42L)
      .groupBy(keys.map(col): _*).count()
      .filter(col("count") >= lit(hotThreshold * sampleFraction))
      .select(keys.map(col): _*)
    val hot = left.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotPlan.collect(): _*), hotPlan.schema)
    val leftHot = left.join(broadcast(hot), keys, "left_semi")
    val leftCold = left.join(broadcast(hot), keys, "left_anti")
    val rightHot = right.join(broadcast(hot), keys, "left_semi")
    leftCold.join(right, keys)
      .unionByName(saltedJoin(leftHot, rightHot, keys, saltFactor,
        saltSource))
  }
}
