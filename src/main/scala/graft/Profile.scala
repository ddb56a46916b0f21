package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one named query N times (first run = cold plan,
  * later runs = warm JIT/caches), print per-run seconds and the final
  * formatted physical plan. Usage:
  *   runMain graft.Profile <queryName> [sfDir] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Stage-level attribution: wall time and summed task time per stage.
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(0L)
          stages.put(si.stageId,
            (si.name.takeWhile(_ != '\n').take(70), wall,
              si.taskMetrics.executorRunTime))
        }
      })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      if (i == reps) {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (id, (nm, wall, task)) =>
            println(f"[stage] $id%4d wall=${wall / 1e3}%.2fs task=${task / 1e3}%.2fs $nm")
        }
      }
    }
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
