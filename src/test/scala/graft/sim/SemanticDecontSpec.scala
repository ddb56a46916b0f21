package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

/** Semantic decontamination primitive: the oracle (driver gate)
  * hash-verifies the per-language rollup; this spec pins the match
  * semantics (every planted leak caught, decorrelated train clean)
  * and the scale shape (eval side broadcast, no cartesian product).
  */
class SemanticDecontSpec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)

  test("every planted paraphrase is matched; the decorrelated train " +
       "split stays clean") {
    val evalSet = vecs.filter(col("vec_id") % 10 === 0)
    val planted = evalSet.select((col("vec_id") + 200000L).as("vec_id"),
      concat(array(element_at(col("embedding"), 1) + lit(0.05)),
        slice(col("embedding"), 2, 63)).as("embedding"), col("label"))
    val train = vecs.filter(col("vec_id") % 10 =!= 0)
      .unionByName(planted)
    val cents = Similarity.trainCentroids(vecs)
    val hits = Similarity.semanticMatchedIds(train, evalSet, cents,
      tau = 0.99).collect().map(_.getLong(0)).toSet
    val plantedIds = planted.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(plantedIds.subsetOf(hits),
      s"missed leaks: ${(plantedIds -- hits).take(5)}")
    assert((hits -- plantedIds).isEmpty,
      s"false positives on the decorrelated split: ${
        (hits -- plantedIds).take(5)}")
  }

  test("the match is cell-blocked: eval side broadcasts, no cartesian") {
    val evalSet = vecs.filter(col("vec_id") % 10 === 0)
    val train = vecs.filter(col("vec_id") % 10 =!= 0)
    val cents = Similarity.trainCentroids(vecs)
    val plan = Similarity.semanticMatchedIds(train, evalSet, cents, 0.99)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
