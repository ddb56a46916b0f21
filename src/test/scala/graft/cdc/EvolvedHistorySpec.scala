package graft.cdc

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.CdcQueries

/** cdc_evolved_history — the mixed-writer-schema Avro replay
  * (README.md:466-479 cases end-to-end): v1-written rows surface
  * props = NULL after normalization, v2 rows keep theirs, and the
  * whole Avro round-trip is invisible next to a plain no-Avro replay.
  */
class EvolvedHistorySpec extends SparkSpec {

  private val cutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z
  private val cutoff2Us = 1705708800000000L // 2024-01-20T00:00:00Z

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), Option(r.get(1)), Option(r.get(2)), r.getInt(3))

  test("Avro evolved replay ≡ plain replay, absent columns nulled") {
    val got = graft.SparkEntry.queries("cdc_evolved_history")(spark, sf)
      .collect().map(key)

    val feed = CdcQueries.flatFeed(spark, sf)
      .withColumn("schema_version",
        when(col("ts_us") < cutoffUs, 1)
          .when(col("ts_us") < cutoff2Us, 2).otherwise(3))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val expected = feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("key"),
        when(col("schema_version") === 3, lit(null))
          .otherwise(col("value")).as("value"),
        when(col("schema_version") === 1, lit(null))
          .otherwise(col("props")).as("props"),
        col("schema_version"))
      .orderBy(col("key"))
      .collect().map(key)

    assert(got.nonEmpty)
    assert(got.sameElements(expected))
    // the input history actually exercises all three writer versions
    // (the WINNING rows may all be recent — coverage is on the wire)
    val versions = feed.select("schema_version").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(versions == Set(1, 2, 3))
    // v3 winners: value dropped by the writer, props kept
    assert(got.exists(r => r._4 == 3 && r._2.isEmpty && r._3.nonEmpty))
  }
}
