package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness: recall/build-time of the IVF-PQ index across
  * (m, ksub) settings, against exact brute force on the same corpus.
  * Usage: runMain graft.PqTune [sfDir]
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = ops.SimilarityQueries.doubleVecs(spark, sfDir)
    val probes = vecs.filter(col("vec_id") < 8)
    val bruteTop = sim.Similarity.bruteForceTopK(vecs, probes, 5)
      .select(col("query_id"), col("cand_id"))
    bruteTop.cache()
    val nBrute = bruteTop.count().toDouble
    for ((m, ksub) <- Seq((8, 64), (16, 64), (16, 256), (32, 16), (32, 64))) {
      val dir = s"/tmp/graft_pqtune_${m}_${ksub}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val t0 = System.nanoTime()
      sim.Similarity.buildIvfPqIndex(vecs, dir, m = m, ksub = ksub)
      val build = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pqTop = sim.Similarity.ivfPqProbeIndexed(dir, probes, 5)
        .select(col("query_id"), col("cand_id"))
      val rec = pqTop.intersect(bruteTop).count() / nBrute
      val probeSec = (System.nanoTime() - t1) / 1e9
      val refTop = sim.Similarity.ivfPqProbeRefined(dir, vecs, probes, 5)
        .select(col("query_id"), col("cand_id"))
      val recRef = refTop.intersect(bruteTop).count() / nBrute
      val bytes = fs.getContentSummary(
        new org.apache.hadoop.fs.Path(
          s"$dir/${sim.Similarity.indexVersion(spark, dir)}/cells"))
        .getLength
      println(f"m=$m%2d ksub=$ksub%3d build=$build%6.2fs " +
        f"probe+recall=$probeSec%6.2fs recall@5=$rec%.3f " +
        f"refined@5=$recRef%.3f cellsBytes=$bytes%d")
    }
    spark.stop()
  }
}
