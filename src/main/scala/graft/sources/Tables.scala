package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType, TimestampNTZType, TimestampType}

import java.time.{Instant, LocalDateTime, ZoneOffset}

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
  /** `events.ts` has shipped in two on-disk encodings (FIXTURES.md):
    * TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless read as a raw nano-long via the
    * legacy conf, and plain µs `timestamp[us]` (naive, i.e.
    * isAdjustedToUTC=false → TIMESTAMP_NTZ on read). The loader sniffs
    * the scanned type and normalizes BOTH to a microsecond
    * TimestampType whose instant equals the wall clock read as UTC —
    * exactly what DuckDB's `epoch_us(ts)` oracle sees. The driver data
    * is µs-aligned ("oracles must not depend on sub-microsecond
    * digits"), so the nano truncation loses nothing.
    */
  def events(s: SparkSession, d: String): DataFrame =
    eventsWindow(s, d, None, None)

  /** The scanned type of `events.ts` for this directory, MEMOIZED per
    * (dir, mtime): the sniff costs a file listing + footer read, and
    * every events-based query construction would otherwise pay it a
    * second time on top of its own scan — at lake scale, listing is a
    * real cost. The cache validates against the path's modification
    * time (one `getFileStatus`, far cheaper than the footer sniff), so
    * a dataset REGENERATED at the same path with a different encoding
    * (GenScale write-then-read, test fixtures) re-sniffs instead of
    * producing a wrong-typed pushdown literal (ADVICE r6). Side effect
    * on first sniff: enables the legacy nano-as-long read so
    * TIMESTAMP(NANOS) files scan as LongType instead of failing (a
    * no-op for µs files).
    */
  def eventsTsType(s: SparkSession, d: String): DataType = {
    // set on THIS session even on a cache hit — the cache is
    // JVM-global, the conf is per-session, and a nano file needs it
    // at actual read time, not just at sniff time
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val mtime = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getModificationTime
    tsTypeCache.compute(d, (_, cached) => cached match {
      case (`mtime`, _) => cached
      case _ => (mtime, load(s, d, "events").schema("ts").dataType)
    })._2
  }

  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, DataType)]()

  /** Events with an event-time window PUSHED INTO THE SCAN: the bounds
    * are applied to the raw scan column in ITS OWN type BEFORE any
    * normalization, so they appear in `PushedFilters` and prune parquet
    * row groups — a filter on a derived timestamp would silently scan
    * everything (`f(col)` predicates never push). At 100 TB the time
    * window is the difference between reading a day and reading the
    * lake.
    */
  def eventsWindow(s: SparkSession, d: String,
                   fromUs: Option[Long], untilUs: Option[Long]): DataFrame = {
    val tsType = eventsTsType(s, d)
    val raw = load(s, d, "events")
    val bound = tsBoundLiteral(tsType, _)
    val bounded = (fromUs, untilUs) match {
      case (Some(lo), Some(hi)) =>
        raw.filter(col("ts") >= bound(lo) && col("ts") < bound(hi))
      case (Some(lo), None) => raw.filter(col("ts") >= bound(lo))
      case (None, Some(hi)) => raw.filter(col("ts") < bound(hi))
      case _ => raw
    }
    normalizeTs(bounded, tsType)
  }

  /** A window bound (epoch µs) as a literal of the SCAN column's own
    * type, so the comparison is a plain `col op lit` the parquet source
    * can push. Nano-long scans compare in nanos; timestamp scans
    * compare against a timestamp literal (LocalDateTime for NTZ —
    * the fixture contract reads NTZ wall clock as UTC).
    */
  private def tsBoundLiteral(tsType: DataType, us: Long): Column =
    tsType match {
    case LongType => lit(us * 1000L)
    case TimestampNTZType => lit(LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC))
    case TimestampType => lit(Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case other => throw new IllegalStateException(
      s"unsupported events.ts encoding: $other")
  }

  /** Normalize a scanned `ts` to µs TimestampType.
    *  - nano-long: integral `div`, NOT `/` — long/long promotes to
    *    double and rounds half-up, which would disagree with DuckDB's
    *    truncating epoch_us on events with sub-microsecond digits.
    *  - NTZ: the cast reinterprets wall clock in the SESSION zone, and
    *    the fixture contract reads NTZ wall clock as UTC — so the
    *    session zone must BE UTC. The loader ASSERTS that instead of
    *    silently overwriting it (VERDICT r6 item 7: a read that
    *    reconfigures the session changes the semantics of unrelated
    *    timestamp logic); every entry point (Verify/Bench/ScaleProbe/
    *    GenScale/Profile/SparkSpec) pins UTC at session construction.
    */
  private def normalizeTs(df: DataFrame, tsType: DataType): DataFrame =
    tsType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        val zone = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if (zone != "UTC") throw new IllegalStateException(
          s"events.ts is TIMESTAMP_NTZ and the fixture contract reads " +
            s"its wall clock as UTC, but spark.sql.session.timeZone is " +
            s"'$zone' — pin UTC at session construction " +
            s"""(.config("spark.sql.session.timeZone", "UTC"))""")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"unsupported events.ts encoding: $other")
    }

  /** `events` as a file-source STREAM (readStream needs an explicit
    * schema), normalized identically to [[events]] — the helper behind
    * the batch/stream parity specs, and the reason a testdata encoding
    * change lands in one place instead of every streaming call site.
    */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    val tsType = eventsTsType(s, d)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", org.apache.spark.sql.types.StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType),
      StructField("props", org.apache.spark.sql.types.StringType)))
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    normalizeTs(raw, tsType)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
