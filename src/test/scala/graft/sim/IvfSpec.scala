package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

class IvfSpec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)
  private def planted = SimilarityQueries.plantedVecs(spark, sf)

  test("IVF retrieves the planted near-identical vector at rank 1") {
    val queries = planted.filter(col("vec_id") >= 100000L)
    val top = Similarity.ivfTopK(planted, queries, 1, nlist = 16, nprobe = 3)
    val hits = top.filter(col("cand_id") === col("query_id") - 100000L)
    val total = queries.count()
    // a near-identical vector lands in the same best cell virtually
    // always; nprobe=3 covers quantization boundary wobble
    assert(hits.count() >= (total * 0.9).toLong,
      s"IVF recall ${hits.count()}/$total")
  }

  test("IVF scores agree with brute force on shared candidates") {
    val queries = vecs.filter(col("vec_id") < 4)
    val brute = Similarity.bruteForceTopK(vecs, queries, 2000)
      .select("query_id", "cand_id", "cosine")
    val ivf = Similarity.ivfTopK(vecs, queries, 50)
      .select("query_id", "cand_id", "cosine")
    assert(ivf.except(brute).isEmpty,
      "IVF produced a (query,cand,cosine) brute force disagrees with")
  }

  test("IVF probes bound the scanned fraction of the corpus") {
    val queries = vecs.filter(col("vec_id") < 8)
    val top = Similarity.ivfTopK(vecs, queries, 1000, nlist = 16, nprobe = 2)
    // with 2 of 16 cells probed, each query sees roughly 1/8 of the
    // corpus; assert the candidate pool stays well under half
    val maxCands = top.groupBy("query_id").count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxCands < vecs.count() / 2,
      s"probing scanned too much: $maxCands candidates")
  }
}
