package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Phase-level timing for the standing shingle index lifecycle — the
  * instrument behind the round-8 append-overhead reduction pass
  * (VERDICT r7 item 4): build / append / probe wall time, separately,
  * twice (cold + warm), so a whole-query number's noise can't hide
  * which phase a change actually moved.
  *
  *   runMain graft.tools.AppendProbe [sfDir]
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // per-job wall attribution: [job] lines print duration at job end
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(j.jobId, j.time)
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val d = j.time - jobStart.getOrDefault(j.jobId, j.time)
          if (d > 30) println(f"[job] ${j.jobId}%4d ${d / 1e3}%6.2f s")
        }
      })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val existing = Tables.documents(spark, sfDir).select("doc_id", "text")
    val incoming = existing.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      spark.catalog.clearCache()
      val dir = s"/tmp/graft_append_probe/r$round"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      t("build(2/3)") {
        Dedup.buildShingleIndex(
          existing.filter(col("doc_id") % 3 =!= 0), dir)
      }
      t("append(1/3)") {
        Dedup.appendShingleIndex(dir,
          existing.filter(col("doc_id") % 3 === 0))
      }
      t("probe") {
        val pr = Dedup.probeShingleIndex(dir, incoming, k = 3,
          threshold = 0.8)
        pr.write.mode("overwrite").format("noop").save()
        if (round == 2 && args.length > 1)
          println(pr.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0))
      }
    }
    spark.stop()
  }
}
