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
  * State is a parquet table HASH-BUCKETED on the key into
  * `Config.numBuckets` partition directories (`__bucket=<b>/`), merged
  * PARTITION-SCOPED: a micro-batch rewrites only the buckets its keys
  * hash into (Spark's dynamic partition overwrite); untouched buckets'
  * files are not read, not rewritten, not even listed for write. Merge
  * cost is therefore ∝ batch keys × (table size / numBuckets), never
  * ∝ table size — the Hudi upsert shape (`/root/reference/README.md:22`:
  * file groups touched by the batch are the only ones rewritten). At
  * 100 TB you'd layer a table format's commit timeline on top for
  * atomicity across buckets; the I/O scoping is the part that scales.
  */
object CdcPipeline {

  final case class Config(
      keyCols: Seq[String] = Seq("key"),
      tsCol: String = "ts",
      orderCols: Seq[String] = Seq("ts_us", "event_id"),
      opCol: String = "op",
      watermarkDelay: String = "10 minutes",
      numBuckets: Int = 32)

  /** Deterministic bucket of a row's key — the unit of merge I/O. */
  private[streaming] def bucketOf(cfg: Config): org.apache.spark.sql.Column =
    pmod(xxhash64(cfg.keyCols.map(col): _*), lit(cfg.numBuckets))
      .cast("int")

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

  /** One micro-batch, partition-scoped: reduce the batch to
    * latest-per-key, read ONLY the state buckets the batch's keys hash
    * into (partition-pruned scan), merge LATEST-WINS BY EVENT TIME, and
    * dynamically overwrite ONLY those bucket directories.
    *
    * The merge is `latest(state ∪ batch)` per key — not a blind
    * replace — so it converges under ANY replay order: re-delivering an
    * old batch after a newer one is a no-op (the state row out-orders
    * it). Tombstones are RETAINED in state (op = d rows) so a delete
    * also cannot be resurrected by an older replayed upsert; external
    * readers get live rows via [[currentState]]'s filter. (At lake
    * scale a compaction pass drops tombstones older than the replay
    * horizon — bounded retention, same as Kafka compacted-topic
    * deletes.)
    */
  def mergeBatch(batch: DataFrame, statePath: String, cfg: Config,
                 batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val order = cfg.orderCols.map(col)
    val latest = Materialize.latest(batch, cfg.keyCols, order)
      .withColumn("__bucket", bucketOf(cfg))
    val dataPath = s"$statePath/data"
    val fs = new Path(dataPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // touched-bucket list: ≤ numBuckets ints, driver-side by design
    val touched = latest.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val merged =
      if (fs.exists(new Path(dataPath))) {
        val state = spark.read.parquet(dataPath)
          .filter(col("__bucket")
            .isin(touched.toSeq.map(Integer.valueOf): _*))
        Materialize.latest(
          state.unionByName(latest.select(state.columns.map(col): _*)),
          cfg.keyCols, order)
      } else latest
    // materialize before the write: the merge reads the same bucket
    // directories it overwrites, and Spark (rightly) refuses a write
    // whose plan still scans the destination.
    val out = merged.localCheckpoint()
    out.write
      .partitionBy("__bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dataPath)
    // NB: every touched bucket has ≥1 output row by construction
    // (tombstones are retained, latest() keeps one row per key), so
    // dynamic overwrite never leaves a stale touched bucket behind.
  }

  /** Read the current materialized state (live rows only — retained
    * tombstones are internal merge state), if any batch has committed.
    */
  def currentState(spark: SparkSession, statePath: String,
                   opCol: String = "op"): Option[DataFrame] = {
    val p = new Path(s"$statePath/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val df = spark.read.parquet(p.toString).drop("__bucket")
      Some(if (df.columns.contains(opCol)) df.filter(col(opCol) =!= "d")
           else df)
    }
  }
}
