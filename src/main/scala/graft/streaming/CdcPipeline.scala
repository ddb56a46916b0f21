package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.Materialize

/** Streaming CDC materialization — the reference's deployed data plane
  * (Debezium topic → Hudi upsert, `/root/reference/README.md:22`)
  * re-expressed on Structured Streaming:
  *
  *   readStream (change-event feed)
  *     → event-time watermark (T3 late/replayed data)
  *     → dropDuplicatesWithinWatermark (A4 at-least-once dedup)
  *     → foreachBatch: latest-per-key + upsert into versioned state (A1-A3)
  *
  * The file source stands in for Kafka (no broker in the sandbox —
  * SURVEY.md §7.2); the Kafka variant is the same pipeline with
  * `format("kafka")` + key/value decode and is config-only here.
  *
  * State is a versioned parquet directory with a `_CURRENT` pointer —
  * a deliberately minimal copy-on-write table. At 100 TB you'd swap the
  * sink for a merge-on-read table format (what DeltaStreamer does); the
  * pipeline shape — one shuffle on key per micro-batch, state co-located
  * by key — is the part that scales.
  */
object CdcPipeline {

  final case class Config(
      keyCols: Seq[String] = Seq("key"),
      tsCol: String = "ts",
      orderCols: Seq[String] = Seq("ts_us", "event_id"),
      opCol: String = "op",
      watermarkDelay: String = "10 minutes")

  /** File-backed change-event stream (schema must be supplied: streaming
    * sources cannot infer).
    */
  def fileSource(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** A4/T3: watermarked exact-duplicate drop. State for a key expires
    * once the watermark passes, so memory is bounded by delay × rate,
    * not by history length.
    */
  def dedupWithinWatermark(changes: DataFrame, cfg: Config): DataFrame = {
    val cols = (cfg.keyCols ++ cfg.orderCols) :+ cfg.opCol
    changes
      .withWatermark(cfg.tsCol, cfg.watermarkDelay)
      .dropDuplicatesWithinWatermark(cols.head, cols.tail: _*)
  }

  /** Start the pipeline: dedup → per-batch latest-wins merge into
    * `statePath`. AvailableNow processes everything present then stops
    * (test/replay mode); pass `trigger = None` for continuous.
    */
  def start(changes: DataFrame,
            statePath: String,
            checkpointPath: String,
            cfg: Config = Config(),
            availableNow: Boolean = true): StreamingQuery = {
    val deduped = dedupWithinWatermark(changes, cfg)
    val writer = deduped.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch.drop(cfg.tsCol), statePath, cfg, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One micro-batch: reduce the batch to latest-per-key, then merge into
    * the current state snapshot (copy-on-write + atomic pointer flip).
    * Idempotent under batch replay: merging the same batch twice is a
    * no-op because upsert is keyed.
    */
  def mergeBatch(batch: DataFrame, statePath: String, cfg: Config,
                 batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val order = cfg.orderCols.map(col)
    val latest = Materialize.latest(batch, cfg.keyCols, order)
    val merged = currentState(spark, statePath) match {
      case Some(state) =>
        // Keep only strictly newer changes per key, then upsert: makes
        // replayed batches (at-least-once restart) a true no-op.
        Materialize.upsert(state, latest.select(state.columns.map(col): _*),
          cfg.keyCols, cfg.opCol)
      case None =>
        Materialize.dropTombstones(latest, cfg.opCol)
    }
    val versionDir = s"$statePath/v$batchId"
    merged.write.mode("overwrite").parquet(versionDir)
    writePointer(spark, statePath, s"v$batchId")
  }

  /** Read the current materialized state, if any batch has committed. */
  def currentState(spark: SparkSession, statePath: String)
      : Option[DataFrame] = {
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(statePath, "_CURRENT")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val version = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      Some(spark.read.parquet(s"$statePath/$version"))
    }
  }

  private def writePointer(spark: SparkSession, statePath: String,
                           version: String): Unit = {
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(statePath, s"_CURRENT.tmp")
    val dst = new Path(statePath, "_CURRENT")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    // local FS rename won't clobber; delete-then-rename is fine for this
    // single-writer sink (a real deployment uses a table format's commit).
    if (fs.exists(dst)) fs.delete(dst, false)
    fs.rename(tmp, dst)
  }
}
