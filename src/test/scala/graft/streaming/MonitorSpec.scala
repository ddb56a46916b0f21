package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.CdcQueries

class MonitorSpec extends SparkSpec {

  test("listener records progress for a streaming run") {
    val listener = Monitor.attach(spark)
    try {
      val base = Files.createTempDirectory("mon").toString
      val feed = CdcQueries.flatFeed(spark, sf)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      feed.write.mode("append").parquet(s"$base/in")
      val src = CdcPipeline.fileSource(spark, s"$base/in", feed.schema)
      val q = CdcPipeline.start(src, s"$base/state", s"$base/cp")
      q.awaitTermination()
      val ok = Monitor.pollUntil(
        () => listener.ticks.exists(_.numInputRows > 0), 100, 20000)
      assert(ok >= 0, "no progress tick with input rows recorded")
    } finally spark.streams.removeListener(listener)
  }

  test("elapsed time renders like the reference's HH:MM:SS") {
    assert(Monitor.elapsedHms(0) === "00:00:00")
    assert(Monitor.elapsedHms(61000) === "00:01:01")
    assert(Monitor.elapsedHms(3661000) === "01:01:01")
    assert(Monitor.elapsedHms(86399000) === "23:59:59")
  }
}
