package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Materialize
import graft.ops.CdcQueries
import graft.sources.Tables

/** Streaming CDC pipeline: batch/stream parity, incremental restart,
  * and at-least-once redelivery (SURVEY.md §5.2 item 2, §7.1 M5).
  */
class CdcPipelineSpec extends SparkSpec {

  private val cutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z

  /** Change feed with the event-time column the watermark needs. */
  private def feed: DataFrame =
    CdcQueries.flatFeed(spark, sf)
      .withColumn("ts", timestamp_micros(col("ts_us")))

  private def runStream(inDir: String, stateDir: String, cpDir: String): Unit = {
    val src = CdcPipeline.fileSource(spark, inDir, feed.schema)
    val q = CdcPipeline.start(src, stateDir, cpDir)
    q.awaitTermination()
  }

  private def expectedState(f: DataFrame): DataFrame =
    Materialize.currentState(f.drop("ts"), Seq("key"),
      Seq(col("ts_us"), col("event_id")))

  test("stream materialization equals batch replay (two incremental runs)") {
    val base = Files.createTempDirectory("cdcpipe").toString
    val (in, state, cp) = (s"$base/in", s"$base/state", s"$base/cp")

    // chunk 1: events before the cutoff
    feed.filter(col("ts_us") < cutoffUs)
      .write.mode("append").parquet(in)
    runStream(in, state, cp)
    val mid = CdcPipeline.currentState(spark, state).get
    val expectedMid = expectedState(feed.filter(col("ts_us") < cutoffUs))
    assert(mid.select("key", "value", "props").except(
      expectedMid.select("key", "value", "props")).isEmpty)
    assert(expectedMid.count() === mid.count())

    // chunk 2: the rest arrives; restart from the same checkpoint
    feed.filter(col("ts_us") >= cutoffUs)
      .write.mode("append").parquet(in)
    runStream(in, state, cp)
    val fin = CdcPipeline.currentState(spark, state).get
    val expectedFin = expectedState(feed)
    assert(fin.select("key", "value", "props").except(
      expectedFin.select("key", "value", "props")).isEmpty)
    assert(expectedFin.count() === fin.count())
  }

  test("duplicate deliveries across files collapse to the same state") {
    val base = Files.createTempDirectory("cdcdup").toString
    val (in, state, cp) = (s"$base/in", s"$base/state", s"$base/cp")
    // same events written twice = at-least-once redelivery
    feed.write.mode("append").parquet(in)
    feed.write.mode("append").parquet(in)
    runStream(in, state, cp)
    val fin = CdcPipeline.currentState(spark, state).get
    val expected = expectedState(feed)
    assert(fin.count() === expected.count())
    assert(fin.select("key", "value").except(
      expected.select("key", "value")).isEmpty)
  }

  test("tombstoned keys are absent from the materialized state") {
    val base = Files.createTempDirectory("cdctomb").toString
    val (in, state, cp) = (s"$base/in", s"$base/state", s"$base/cp")
    feed.write.mode("append").parquet(in)
    runStream(in, state, cp)
    val fin = CdcPipeline.currentState(spark, state).get
    val deletedLast = Materialize.latest(feed.drop("ts"), Seq("key"),
      Seq(col("ts_us"), col("event_id")))
      .filter(col("op") === "d").select("key")
    assert(fin.join(deletedLast, Seq("key"), "left_semi").isEmpty)
  }
}
