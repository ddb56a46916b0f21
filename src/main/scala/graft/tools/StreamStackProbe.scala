package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Sample the microbatch thread's stacks while a bare AvailableNow
  * stream runs — attributes the ~40 ms/op walCommit/latestOffset/
  * commitOffsets floor (raw local-FS write+rename is 0.04-0.4 ms, so
  * the cost is driver-side machinery, not I/O).
  *
  *   sbt 'runMain graft.tools.StreamStackProbe'
  */
object StreamStackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val root = "/tmp/graft_stream_stack"
    val fs = new org.apache.hadoop.fs.Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    // 16 one-file batches => plenty of floor to sample
    docs.filter(col("doc_id") % 3 === 0).repartition(16)
      .write.mode("overwrite").parquet(s"$root/in")

    val counts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      val mx = java.lang.management.ManagementFactory.getThreadMXBean
      while (sampling) {
        mx.dumpAllThreads(false, false).foreach { ti =>
          val tn = ti.getThreadName
          if (tn.contains("microBatchThread") ||
              tn.contains("stream execution thread")) {
            val all = ti.getStackTrace.map { f =>
              s"${f.getClassName}.${f.getMethodName}"
            }
            // for forked-shell samples keep the CALLER chain above
            // Shell (the op that forked); otherwise the leaf chain
            val key =
              if (all.exists(_.contains("hadoop.util.Shell"))) {
                val i = all.lastIndexWhere(_.contains("hadoop.util.Shell"))
                "SHELL-FORK <= " + all.slice(i + 1, i + 9).mkString(" <- ")
              } else all.take(14).mkString(" <- ")
            counts.merge(key, 1, Integer.sum)
          }
        }
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", 8)
    val t0 = System.nanoTime()
    val q = s2.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .writeStream.option("checkpointLocation", s"$root/cp")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        { b.write.format("noop").mode("overwrite").save(); () })
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    sampling = false
    println(f"[stack] wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"batches=${q.recentProgress.length}")
    import scala.jdk.CollectionConverters._
    val total = counts.values.asScala.sum
    println(s"[stack] $total samples; top stacks:")
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) =>
      println(f"[stack] $n%4d  ${k.split(" <- ").take(6).mkString(" <- ")}")
    }
    spark.stop()
  }
}
