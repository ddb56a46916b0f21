package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

class SimilaritySpec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)
  private def planted = SimilarityQueries.plantedVecs(spark, sf)

  test("brute-force top-1 of a planted near-copy is its original") {
    val queries = planted.filter(col("vec_id") >= graft.ops.SimilarityQueries.PlantedIdOffset)
    val top = Similarity.bruteForceTopK(planted, queries, 1).cache()
    top.collect().foreach { r =>
      val (q, cand, cos) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      assert(cand === q - graft.ops.SimilarityQueries.PlantedIdOffset, s"query $q: top-1 was $cand")
      assert(cos > 0.99, s"query $q: cosine $cos")
    }
    assert(top.count() === planted.filter(col("vec_id") >= graft.ops.SimilarityQueries.PlantedIdOffset).count())
  }

  test("LSH ANN retrieves the planted near-identical vector at rank 1") {
    val queries = planted.filter(col("vec_id") >= graft.ops.SimilarityQueries.PlantedIdOffset)
    val top = Similarity.lshTopK(planted, queries, 1)
    val hits = top.filter(col("cand_id") === col("query_id") - graft.ops.SimilarityQueries.PlantedIdOffset)
    val total = queries.count()
    // near-identical vectors agree on every hyperplane sign with
    // overwhelming probability, so recall should be essentially total
    assert(hits.count() >= (total * 0.9).toLong,
      s"LSH recall ${hits.count()}/$total")
  }

  test("LSH candidates are a subset of brute-force scores (same values)") {
    val queries = vecs.filter(col("vec_id") < 4)
    val brute = Similarity.bruteForceTopK(vecs, queries, 1000)
      .select("query_id", "cand_id", "cosine")
    val ann = Similarity.lshTopK(vecs, queries, 1000)
      .select("query_id", "cand_id", "cosine")
    assert(ann.except(brute).isEmpty,
      "ANN returned a (query,cand,cos) triple brute force disagrees with")
  }

  test("quantized top-k: zero-norm vectors never rank (no NaN greatest)") {
    import spark.implicits._
    // a zero vector quantizes to an all-zero code → norm 0 → 0/0 = NaN,
    // which sorts GREATEST descending; the guard must keep it out of
    // both the candidate set and the query set
    val dim = vecs.select(size(col("embedding"))).head().getInt(0)
    val zero = Seq((999999L, Seq.fill(dim)(0.0)))
      .toDF("vec_id", "embedding")
    val corpus = vecs.select("vec_id", "embedding").limit(50)
      .unionByName(zero)
    val top = Similarity.quantizedTopK(corpus,
      corpus.filter(col("vec_id") < 4 || col("vec_id") === 999999L), 5)
      .cache()
    assert(top.filter(col("cand_id") === 999999L).isEmpty,
      "zero-norm vector surfaced as a candidate")
    assert(top.filter(col("query_id") === 999999L).isEmpty,
      "zero-norm query produced (NaN-ranked) results")
    assert(top.filter(col("cosine").isNaN).isEmpty)
    assert(top.count() > 0)
  }

  test("near-dup pairs are exactly the planted perturbed copies") {
    val pairs = Similarity.cosineNearDupPairs(planted, 0.99).cache()
    val expected = vecs.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("a_id"),
        (col("vec_id") + graft.ops.SimilarityQueries.PlantedIdOffset)
          .as("b_id"))
    assert(expected.except(pairs.select("a_id", "b_id")).isEmpty,
      "a planted pair is missing")
    assert(pairs.count() === expected.count(),
      "unexpected extra near-dup pairs at cos ≥ 0.99")
  }
}
