package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

/** Bloom-filter semi-join reduction — the 100 TB join-pruning move:
  * when a selective dimension filters the fact side hard, shuffling the
  * full fact table just to drop most of it at the join is the dominant
  * wasted cost. Build a Bloom filter over the (filtered) dim keys, ship
  * it to every fact partition, and drop non-matching fact rows BEFORE
  * the exchange: the shuffle then carries only (matches + fpp·misses).
  *
  * This is exactly what Spark's `InjectRuntimeFilter` does implicitly
  * when its heuristics fire; the explicit operator exists for the cases
  * they don't cover — reusing one filter across several joins, pruning
  * ahead of an aggregation, or pruning a stream against a static dim.
  *
  * Correctness: a Bloom filter has NO false negatives, and its false
  * positives are removed by the join itself — the result is value-equal
  * to the plain equi-join (the oracle for `join_bloom_pruned` asserts
  * precisely this). Null fact keys hash to the seed value and may pass
  * the filter; the equi-join drops them, same as without pruning.
  */
object BloomPrune {

  /** Inner equi-join with the fact side Bloom-pruned pre-shuffle.
    *
    * The filter build is ONE job over `dim` (mergeable partial
    * sketches; bytes ∝ expectedItems, independent of fact size); the
    * bytes ride to executors as a task literal, the same movement as
    * Spark's own runtime-filter subquery. `expectedItems ≤ 0` ⇒ a
    * 64 Ki-item default (~77 KB filter) — deliberately NOT a
    * `dim.count()` pre-job, which would add a full extra pass over the
    * dim subtree every call. An undersized filter only raises the
    * false-positive rate (less pruning, never a wrong result); callers
    * that know their dim cardinality pass it for an exactly-sized
    * filter.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedItems: Long = 0L): DataFrame = {
    val items = if (expectedItems > 0) expectedItems else 65536L
    val bytes = dim.select(Native.bloomAgg(col(dimKey), items).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact.filter(Native.bloomMightContain(bytes, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
