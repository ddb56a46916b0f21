package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference's source surface is the set of MySQL tables Debezium
  * snapshots and tails (`/root/reference/bin/mskc-connector.sh:395-409`,
  * include-list `:406`); here those become parquet scans, and `events`
  * doubles as the change-log feed (FIXTURES.md B.1).
  *
  * Every load is a plain `spark.read.parquet` so Catalyst pushes predicates
  * and prunes columns into the scan. At 100 TB the scan is the dominant
  * cost: callers must `select` only what they need and filter early so
  * `PushedFilters`/`ReadSchema` show up in the physical plan — never
  * pre-materialize a table driver-side.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark 4 rejects
    * outright (PARQUET_TYPE_ILLEGAL). Read it as a raw nano-long via the
    * legacy conf (runtime-settable, scoped to this session) and normalize
    * to a microsecond TimestampType — the driver data is µs-aligned
    * (FIXTURES.md: "oracles must not depend on sub-microsecond digits"),
    * so nothing is lost and DuckDB sees identical instants.
    */
  def events(s: SparkSession, d: String): DataFrame =
    eventsWindow(s, d, None, None)

  /** Events with an event-time window PUSHED INTO THE SCAN: the bounds
    * are applied to the raw nano-long column BEFORE the µs conversion,
    * so they appear in `PushedFilters` and prune parquet row groups —
    * a filter on the derived timestamp would silently scan everything
    * (`f(col)` predicates never push). At 100 TB the time window is the
    * difference between reading a day and reading the lake.
    */
  def eventsWindow(s: SparkSession, d: String,
                   fromUs: Option[Long], untilUs: Option[Long]): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    val bounded = (fromUs, untilUs) match {
      case (Some(lo), Some(hi)) =>
        raw.filter(col("ts") >= lo * 1000L && col("ts") < hi * 1000L)
      case (Some(lo), None) => raw.filter(col("ts") >= lo * 1000L)
      case (None, Some(hi)) => raw.filter(col("ts") < hi * 1000L)
      case _ => raw
    }
    // integral `div`, NOT `/`: long/long promotes to double and rounds
    // half-up, which would disagree with DuckDB's truncating epoch_us
    // on events with sub-microsecond digits.
    bounded.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
