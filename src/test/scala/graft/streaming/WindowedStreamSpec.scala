package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Tables

/** Batch/stream parity for the windowed aggregations: the SAME window
  * operators the batch queries declare (`stream_tumbling_window`,
  * `stream_session_window`) produce the SAME results when driven
  * through a real `readStream` file source — the property that lets
  * the engine serve one logical definition on both planes.
  */
class WindowedStreamSpec extends SparkSpec {

  /** events as an actual stream: same ts normalization as Tables.events
    * (encoding-sniffed), driven by the file source.
    */
  private def eventStream(): DataFrame = Tables.eventsStream(spark, sf)

  private def runComplete(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("tumbling window: stream equals batch") {
    val agg = (e: DataFrame) => e
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("day_us"),
        col("event_type"), col("n"))
    val streamed = runComplete(agg(eventStream()), "tumbling_parity")
      .collect().toSet
    val batch = agg(Tables.events(spark, sf)).collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("watermark drops late data from append-mode windowed aggregation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    def write(name: String, rows: Seq[(java.sql.Timestamp, Long)]): Unit =
      rows.toDF("ts", "v").repartition(1)
        .write.mode("overwrite").parquet(s"$dir/$name")
    def t(min: Int) = new java.sql.Timestamp(
      java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(min * 60L).toEpochMilli)
    // batch 1: two events in window [00:00,01:00) + one far ahead that
    // advances the watermark past that window's end
    write("b1", Seq((t(5), 1L), (t(10), 2L), (t(600), 3L)))
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("w_us"), col("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE event for the already-finalized first window —
      // the watermark (09:00 area) is far past its end, so it must be
      // dropped, not re-emitted or double-counted
      write("b2", Seq((t(15), 9L)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("wm_test")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val firstWindowUs = 1704067200000000L // 2024-01-01T00:00:00Z
    assert(out.get(firstWindowUs) === Some(2L),
      s"first window must hold only the 2 on-time events, got $out")
  }

  test("session window: stream equals batch") {
    val agg = (e: DataFrame) => e
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_us"), col("n"))
    val streamed = runComplete(agg(eventStream()), "session_parity")
      .collect().toSet
    val batch = agg(Tables.events(spark, sf)).collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
