package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-scale probe for the IVF family (VERDICT r6 item 1): at a
  * given sf dir, build the persisted index with the corpus-DERIVED
  * nlist ([[graft.sim.Similarity.deriveNlist]]), then measure
  *  - recall@5 of the pruned probe vs exact brute force at the DERIVED
  *    nprobe (fixed coverage — the engine default) and at pinned
  *    nprobe 3 and 8 (fixed candidate budget);
  *  - recall@1 of a PLANTED near-identical neighbor (cos ≈ 0.999, the
  *    near-dup/dedup workload) at pinned nprobe=3.
  * One JSON line per run; rows across sf dirs make the BASELINE.md
  * recall-vs-SF table. `nlistOverride` pins nlist instead of deriving
  * — the control row reproducing the fixed-16-cell decay.
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir> [label] [nlistOverride]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val label = args.lift(1).getOrElse(sfDir)
    val nlistOverride = args.lift(2).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = graft.ops.SimilarityQueries.doubleVecs(spark, sfDir)
    val n = vecs.count()
    val dir = s"/tmp/graft_recallprobe_${label.hashCode.abs}_$nlistOverride"
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    graft.sim.Similarity.buildIvfIndex(vecs, dir, nlist = nlistOverride)
    val cents = graft.sim.Similarity.readCentroids(spark, dir,
      graft.sim.Similarity.indexVersion(spark, dir))
    val nlist = cents.length
    val npDefault = graft.sim.Similarity.deriveNprobe(nlist)

    val probes = vecs.filter(col("vec_id") < 8)
    val bruteTop = graft.sim.Similarity.bruteForceTopK(vecs, probes, 5)
      .select(col("query_id"), col("cand_id"))
    val nBrute = bruteTop.count().toDouble
    def recallAt(nprobe: Int): Double = {
      val probeTop = graft.sim.Similarity
        .ivfProbeIndexed(dir, probes, 5, nprobe)
        .select(col("query_id"), col("cand_id"))
      probeTop.intersect(bruteTop).count() / nBrute
    }
    val rDef = recallAt(npDefault)
    val r3 = recallAt(3)
    val r8 = recallAt(8)
    // the auto-tuned policy point (r12: held-out band + margin — the
    // row that shows whether tuned recall clears its 0.95 target)
    val tuned = graft.sim.Similarity.tuneNprobe(vecs, cents, 0.95)
    val rTuned = recallAt(tuned)

    // planted near-identical neighbors (the dedup workload): every
    // 20th vector gets a perturbed copy; recall@1 at PINNED nprobe=3
    // — near-dups co-locate with their original's cell, so this holds
    // at fixed nprobe regardless of corpus scale (unlike random top-5,
    // which is coverage-bound on a decorrelated corpus)
    val planted = graft.ops.SimilarityQueries.plantedVecs(spark, sfDir)
    val pq = planted.filter(col("vec_id") >= graft.ops.SimilarityQueries.PlantedIdOffset)
    val top = graft.sim.Similarity.ivfTopK(planted, pq, 1,
      nprobe = 3, centroids =
        Some(graft.sim.Similarity.trainCentroids(planted)))
    val hits = top.filter(col("cand_id") === col("query_id") - graft.ops.SimilarityQueries.PlantedIdOffset)
      .count()
    val nPlanted = pq.count()

    println(f"""{"probe":"$label","sf":"$sfDir","n_vecs":$n,""" +
      f""""nlist":$nlist,"nprobe_default":$npDefault,""" +
      f""""recall_at5_npdefault":$rDef%.3f,""" +
      f""""recall_at5_np3":$r3%.3f,"recall_at5_np8":$r8%.3f,""" +
      f""""nprobe_tuned_r95":$tuned,"recall_at5_tuned":$rTuned%.3f,""" +
      f""""planted_recall_at1_np3":${hits.toDouble / nPlanted}%.3f,""" +
      f""""n_planted":$nPlanted}""")
    spark.stop()
  }
}
