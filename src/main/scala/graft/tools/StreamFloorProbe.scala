package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-trigger duration breakdown for the bare AvailableNow machinery
  * under the stream-ingest queries (VERDICT r14 item 3: ~0.2 s/trigger
  * of floor × 4-6 triggers × 6 queries). Prints every progress event's
  * durationMs map — triggerExecution, queryPlanning, walCommit,
  * latestOffset, getBatch, addBatch, commitOffsets — so the fix targets
  * the component that owns the floor, per guide §1.
  *
  *   sbt 'runMain graft.tools.StreamFloorProbe'
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knob: PROBE_RAW_FS swaps in the checksum-free raw local FS
    // (measured: no effect — the floor was fork overhead, not CRC);
    // default is the engine's fork-free NioLocalFileSystem, matching
    // Bench/Verify
    builder.config("spark.hadoop.fs.file.impl",
      if (sys.env.contains("PROBE_RAW_FS"))
        "org.apache.hadoop.fs.RawLocalFileSystem"
      else "graft.sources.NioLocalFileSystem")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val root = "/tmp/graft_stream_floor"
    val fs = new org.apache.hadoop.fs.Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    docs.filter(col("doc_id") % 3 === 0).repartition(4)
      .write.mode("overwrite").parquet(s"$root/in")

    // two identical passes: pass 1 warms codegen/JIT, pass 2 is the read
    (1 to 2).foreach { pass =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", 8)
      // A/B knob: the FileSystem-based checkpoint manager avoids the
      // FileContext rename path, whose link-status checks FORK a
      // readlink process per rename on the local FS (plus a chmod fork
      // per created file) — ~40 ms/op of walCommit/commitOffsets floor
      // that HDFS/S3 deployments never pay
      if (sys.env.contains("PROBE_FS_CKPT")) {
        s2.conf.set("spark.sql.streaming.checkpointFileManagerClass",
          "org.apache.spark.sql.execution.streaming.checkpointing." +
            "FileSystemBasedCheckpointFileManager")
        ()
      }
      val t0 = System.nanoTime()
      val q = s2.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
        .writeStream.option("checkpointLocation", s"$root/cp$pass")
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          { b.write.format("noop").mode("overwrite").save(); () })
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[floor] pass $pass wall=$wall%.2f s " +
        s"batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"[floor]   batch ${p.batchId}: " +
          s"trigger=${d.get("triggerExecution")} " +
          s"planning=${d.get("queryPlanning")} " +
          s"wal=${d.get("walCommit")} " +
          s"latestOffset=${d.get("latestOffset")} " +
          s"getBatch=${d.get("getBatch")} " +
          s"addBatch=${d.get("addBatch")} " +
          s"commit=${d.get("commitOffsets")}")
      }
    }
    spark.stop()
  }
}
