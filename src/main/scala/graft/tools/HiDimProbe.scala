package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-policy transfer at REALISTIC embedding dimension (r10 verdict
  * item 3): every recall/nprobe/PQ/SQ8 number before r11 was measured
  * on the 64-d toy table; distance concentration at 256–768 d is where
  * IVF/PQ geometry actually gets hard. This probe re-measures the
  * whole policy stack — exact brute-force ceiling, auto-tuned nprobe
  * ([[graft.sim.Similarity.tuneNprobe]], target 0.95), PQ ADC, PQ
  * refined re-rank, SQ8 — on a deterministic clustered corpus at the
  * requested dimension and scale.
  *
  * The corpus is a hash-seeded mixture (no RNG, reproducible to the
  * bit): `clusters` centers with uniform[-1,1] coordinates, each
  * vector = its center + `noise`·uniform[-1,1] per coordinate. At the
  * default noise 1.0 the cluster signal and the intra-cluster spread
  * carry EQUAL per-coordinate variance — the hard regime where cells
  * overlap and nprobe actually buys recall (at 0.35 the mixture is so
  * separated that nprobe=1 already scores 1.0 at any dim, which tests
  * nothing). Cluster count deliberately exceeds the derived nlist at
  * the default scale, so the coarse quantizer has to merge real
  * structure — the shape an actual embedding corpus (topical clusters
  * ≫ cells) presents.
  *
  * Usage: runMain graft.tools.HiDimProbe <dim> [n] [clusters] [noise]
  * One JSON line per run; rows across dims make the BASELINE.md
  * dim-transfer table.
  */
object HiDimProbe {

  /** Deterministic clustered corpus: (vec_id long, embedding
    * array<double> of `dim`, label int = cluster). Pure column
    * expressions — generation is distributed and codegen'd, no driver
    * materialization at any n.
    */
  def genEmbeddings(spark: SparkSession, n: Long, dim: Int,
                    clusters: Int, noise: Double = 1.0): DataFrame = {
    // uniform [-1, 1] from a 64-bit hash, exactly reproducible
    def u(cols: org.apache.spark.sql.Column*) =
      pmod(xxhash64(cols: _*), lit(2000001L)).cast("double") / 1000000.0 - 1.0
    val c = pmod(col("vec_id"), lit(clusters.toLong)).as("label")
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("label", c)
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), j =>
          u(lit("c"), col("label"), j) + lit(noise) * u(lit("n"),
            col("vec_id"), j)))
      .select(col("vec_id"), col("embedding"),
        col("label").cast("int").as("label"))
  }

  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(256)
    val n = args.lift(1).map(_.toLong).getOrElse(2000L)
    val clusters = args.lift(2).map(_.toInt).getOrElse(48)
    val noise = args.lift(3).map(_.toDouble).getOrElse(1.0)
    val label = s"d$dim-n$n-z$noise"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sim.Similarity

    // materialize the corpus once as parquet (every index build +
    // brute pass re-reads it; recomputing the hash mixture per pass
    // would time generation, not geometry)
    val dir = s"/tmp/graft_hidim_${label.hashCode.abs}"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    genEmbeddings(spark, n, dim, clusters, noise)
      .write.parquet(s"$dir/corpus")
    val vecs = spark.read.parquet(s"$dir/corpus")

    val probes = vecs.filter(col("vec_id") < 32)
    val bruteTop = Similarity.bruteForceTopK(vecs, probes, 5)
      .select(col("query_id"), col("cand_id")).cache()
    val nBrute = bruteTop.count().toDouble

    def recall(df: DataFrame): Double =
      df.select(col("query_id"), col("cand_id"))
        .intersect(bruteTop).count() / nBrute

    Similarity.buildIvfIndex(vecs, s"$dir/ivf")
    val cents = Similarity.readCentroids(spark, s"$dir/ivf",
      Similarity.indexVersion(spark, s"$dir/ivf"))
    val nlist = cents.length
    val npDefault = Similarity.deriveNprobe(nlist)
    val tuned = Similarity.tuneNprobe(vecs, cents, 0.95)
    val rDefault = recall(
      Similarity.ivfProbeIndexed(s"$dir/ivf", probes, 5, npDefault))
    val rTuned = recall(
      Similarity.ivfProbeIndexed(s"$dir/ivf", probes, 5, tuned))

    Similarity.buildIvfPqIndex(vecs, s"$dir/pq")
    val rPq = recall(
      Similarity.ivfPqProbeIndexed(s"$dir/pq", probes, 5))
    val rPqRefined = recall(
      Similarity.ivfPqProbeRefined(s"$dir/pq", vecs, probes, 5))

    Similarity.buildIvfSq8Index(vecs, s"$dir/sq8")
    val rSq8 = recall(
      Similarity.ivfSq8ProbeIndexed(s"$dir/sq8", probes, 5))

    println(f"""{"probe":"hidim","label":"$label","dim":$dim,""" +
      f""""n_vecs":$n,"clusters":$clusters,"noise":$noise%.2f,""" +
      f""""nlist":$nlist,""" +
      f""""nprobe_default":$npDefault,"nprobe_tuned_r95":$tuned,""" +
      f""""recall_at5_npdefault":$rDefault%.3f,""" +
      f""""recall_at5_tuned":$rTuned%.3f,""" +
      f""""pq_recall_at5":$rPq%.3f,""" +
      f""""pq_refined_recall_at5":$rPqRefined%.3f,""" +
      f""""sq8_recall_at5":$rSq8%.3f}""")
    spark.stop()
  }
}
