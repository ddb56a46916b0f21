package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Recall-vs-scale probe for IVF-SQ8 (VERDICT r7 item 8): the SQ8
  * claim is that scoring is EXACT in the quantized space, so — unlike
  * PQ's ADC, whose recall decays as the probed candidate count grows
  * with the corpus — SQ8 recall should sit AT the raw exact-scoring
  * probe's ceiling at every scale. This measures recall@5 vs exact
  * brute force for the raw probe and the SQ8 probe on the SAME
  * corpus-derived geometry, at the derived default nprobe and pinned
  * np 3/8. Rows across sf dirs make the BASELINE.md table beside the
  * PQ one.
  *
  * Usage: runMain graft.tools.Sq8Probe <sfDir> [label]
  */
object Sq8Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val label = args.lift(1).getOrElse(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = graft.ops.SimilarityQueries.doubleVecs(spark, sfDir)
    val n = vecs.count()
    val rawDir = s"/tmp/graft_sq8probe_${label.hashCode.abs}_raw"
    val sq8Dir = s"/tmp/graft_sq8probe_${label.hashCode.abs}_sq8"
    Seq(rawDir, sq8Dir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    val t0 = System.nanoTime()
    Similarity.buildIvfSq8Index(vecs, sq8Dir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    Similarity.buildIvfIndex(vecs, rawDir)
    val cents = Similarity.readCentroids(spark, sq8Dir,
      Similarity.indexVersion(spark, sq8Dir))
    val nlist = cents.length
    val npDefault = Similarity.deriveNprobe(nlist)

    val probes = vecs.filter(col("vec_id") < 8)
    val bruteTop = Similarity.bruteForceTopK(vecs, probes, 5)
      .select(col("query_id"), col("cand_id"))
    val nBrute = bruteTop.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("query_id"), col("cand_id"))
        .intersect(bruteTop).count() / nBrute
    def row(np: Int): (Int, Double, Double) = {
      val raw = recall(Similarity.ivfProbeIndexed(rawDir, probes, 5, np))
      val sq8 = recall(Similarity.ivfSq8ProbeIndexed(sq8Dir, probes, 5, np))
      (np, raw, sq8)
    }
    val rows = (Seq(npDefault, 3, 8).distinct).map(row)
    val ver = Similarity.indexVersion(spark, sq8Dir)
    val cellsPath = new org.apache.hadoop.fs.Path(s"$sq8Dir/$ver/cells")
    val bytesPerVec = cellsPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(cellsPath).getLength.toDouble / n
    println(s"""{"label":"$label","n_vecs":$n,"nlist":$nlist""" +
      s""","np_default":$npDefault,"sq8_build_sec":$buildSec""" +
      s""","sq8_bytes_per_vec":$bytesPerVec,"rows":[""" +
      rows.map { case (np, raw, sq8) =>
        s"""{"np":$np,"raw_recall_at5":$raw,"sq8_recall_at5":$sq8}"""
      }.mkString(",") + "]}")
    spark.stop()
  }
}
