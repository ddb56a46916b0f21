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

  /** events as an actual stream: same ns→µs normalization as
    * Tables.events, driven by the file source.
    */
  private def eventStream(): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

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
