package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Tables

/** Stream-stream interval join: the watermarked streaming execution of
  * `StreamJoin.clickAttribution` produces exactly the batch answer when
  * driven through real `readStream` sources, and the plan carries the
  * watermark the state bound depends on.
  */
class StreamJoinSpec extends SparkSpec {

  private def eventStream(): DataFrame = Tables.eventsStream(spark, sf)

  test("streamed interval join equals the batch join") {
    val stream = eventStream()
    val joined = StreamJoin.clickAttribution(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"), "1 hour")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attribution_parity").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attribution_parity")
      .select("purchase_id", "click_id").collect().toSet

    val ev = Tables.events(spark, sf)
    val batch = StreamJoin.clickAttribution(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"), "1 hour")
      .select("purchase_id", "click_id").collect().toSet

    assert(batch.nonEmpty, "no attribution pairs — weak test")
    assert(streamed === batch)
  }

  test("the streaming plan is watermarked on both sides") {
    val stream = eventStream()
    val joined = StreamJoin.clickAttribution(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "purchase"), "1 hour")
    val plan = joined.queryExecution.analyzed.toString
    assert("EventTimeWatermark".r.findAllIn(plan).size == 2,
      s"expected two watermark nodes in:\n$plan")
  }
}
