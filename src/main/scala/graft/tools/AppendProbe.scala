package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF append-cost attribution probe (r14): ScaleProbe's FIXED-delta
  * append row grew with the corpus (1.6 / 8.0 / 9.9 s at sf1/sf10/
  * sf30) while the 10×-bigger ∝-delta append stayed ~2.6 s — the
  * opposite of "cost ∝ delta". The two appends differ in TWO ways at
  * once (delta size AND position in the segment chain), so this probe
  * unconfounds them: the same two deltas are appended to two fresh
  * copies of the same built index in BOTH orders. If cost follows the
  * ORDER (second append slow regardless of which delta it is), the
  * growth is chain-position overhead (manifest/tag/listing ∝
  * segments); if it follows the DELTA, it's genuine append work.
  *
  * Usage: runMain graft.tools.AppendProbe <sfDir> [label]
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf10")
    val label = args.lift(1).getOrElse(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sim.Similarity

    val vecs = graft.ops.SimilarityQueries.doubleVecs(spark, sfDir)
    val big = vecs.filter(col("vec_id") % 10 === 0)
    val fixed = vecs.filter(col("vec_id") % 10 === 1 &&
      col("vec_id") < 20000)
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fresh(d: String): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(d), true): Unit

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    val dA = s"/tmp/graft_appendprobe_a_${label.hashCode.abs}"
    val dB = s"/tmp/graft_appendprobe_b_${label.hashCode.abs}"
    fresh(dA); fresh(dB)
    out("build_a_sec") = t(Similarity.buildIvfIndex(vecs, dA))
    out("build_b_sec") = t(Similarity.buildIvfIndex(vecs, dB))
    // order A: fixed first (2-segment chain), big second (3-segment)
    out("a_fixed_pos1_sec") = t(Similarity.appendIvfIndex(dA, fixed))
    out("a_big_pos2_sec") = t(Similarity.appendIvfIndex(dA, big))
    // order B: big first, fixed second — ScaleProbe's order
    out("b_big_pos1_sec") = t(Similarity.appendIvfIndex(dB, big))
    out("b_fixed_pos2_sec") = t(Similarity.appendIvfIndex(dB, fixed))
    fresh(dA); fresh(dB)

    val fields = out.map { case (k, v) =>
      "\"" + k + "\":" + BigDecimal(v)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP) }
      .mkString(",")
    println(s"""{"probe":"append","label":"$label","sf":"$sfDir",$fields}""")
    spark.stop()
  }
}
