package graft

import org.apache.spark.sql.SparkSession

/** Subset timing harness for local iteration (Bench times the whole
  * inventory; this times named queries under the same methodology —
  * noop sink, cache cleared per run, min-of-2 warm number).
  *
  *   sbt 'runMain graft.TimeQueries q1,q2 /root/testdata/sf0.1'
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      def once(): Double = {
        // same pre-t0 hygiene as Bench.runOnce (blocking release +
        // vacuum barrier): subset numbers must be comparable to the
        // full sitting's
        graft.ops.QueryPack.releaseRetainedBlocks(spark, blocking = true)
        graft.sources.PointerFile.awaitGc()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once(); val b = once()
      println(f"$n%-28s cold=$a%6.2f warm=${math.min(a, b)}%6.2f")
    }
    spark.stop()
  }
}
