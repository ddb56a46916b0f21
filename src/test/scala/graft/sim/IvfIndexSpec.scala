package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

/** Persisted IVF index: probing reads only the probed cells (static
  * partition pruning) and returns exactly what the in-memory IVF path
  * computes from the same trained centroids.
  */
class IvfIndexSpec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)
  private val dir = "/tmp/graft_ivf_index_spec"

  test("indexed probe equals in-memory IVF with the same centroids") {
    Similarity.buildIvfIndex(vecs, dir, nlist = 16, sampleN = 2000,
      iters = 4)
    val queries = vecs.filter(col("vec_id") < 8)
    val indexed = Similarity.ivfProbeIndexed(dir, queries, 5)
    val cents = Similarity.trainCentroids(vecs, 16, 2000, 4)
    val direct = Similarity.ivfTopK(vecs, queries, 5,
      centroids = Some(cents))
    assert(indexed.exceptAll(direct).isEmpty &&
           direct.exceptAll(indexed).isEmpty,
      "indexed probe diverged from in-memory IVF")
    assert(direct.count() > 0)
  }

  test("the probe scan is partition-pruned to the probed cells") {
    Similarity.buildIvfIndex(vecs, dir, nlist = 16)
    val queries = vecs.filter(col("vec_id") < 8)
    val probe = Similarity.ivfProbeIndexed(dir, queries, 5, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("cells") && l.contains("PartitionFilters"))
      .getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[.*centroid_id.*\\].*"),
      s"no partition filter on the cells scan:\n$plan")
    // ≤ 8 queries × 2 probes distinct cells, strictly under nlist
    val cellsTouched = probe.sparkSession.read
      .parquet(s"$dir/cells").select("centroid_id").distinct().count()
    assert(cellsTouched == 16, "index did not materialize all cells")
  }
}
