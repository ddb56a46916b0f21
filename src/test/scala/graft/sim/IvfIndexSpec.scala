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
    // the index materialized a real multi-cell partitioning (empty
    // cells are LEGAL — training keeps a seed for cells that attract
    // no vectors — so this asserts structure, not exactly nlist dirs)
    val cellsTouched = spark.read
      .parquet(s"$dir/${Similarity.indexVersion(spark, dir)}/cells")
      .select("centroid_id").distinct().count()
    assert(cellsTouched > 2 && cellsTouched <= 16,
      s"unexpected cell count $cellsTouched")
  }

  test("rebuilds flip _CURRENT atomically; GC keeps the previous " +
       "version readable and drops older ones") {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(p)) fsys.delete(p, true)
    def versions(): Set[String] = fsys.listStatus(p)
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    Similarity.buildIvfIndex(vecs, dir, nlist = 8)
    val v1 = Similarity.indexVersion(spark, dir)
    Similarity.buildIvfIndex(vecs, dir, nlist = 8)
    val v2 = Similarity.indexVersion(spark, dir)
    assert(v1 != v2, "rebuild reused a version dir")
    // keep-2: the superseded version stays for in-flight readers
    assert(versions() == Set(v1, v2), s"expected {v1,v2}: ${versions()}")
    Similarity.buildIvfIndex(vecs, dir, nlist = 8)
    val v3 = Similarity.indexVersion(spark, dir)
    assert(versions() == Set(v2, v3),
      s"GC should keep exactly the 2 newest: ${versions()}")
    // and the probe works against the new current
    assert(Similarity.ivfProbeIndexed(dir,
      vecs.filter(col("vec_id") < 4), 3).count() > 0)
  }
}
