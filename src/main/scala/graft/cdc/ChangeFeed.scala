package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Builds a Debezium-style change-event feed from the `events` table.
  *
  * The reference deploys `io.debezium.connector.mysql.MySqlConnector`
  * (`/root/reference/bin/mskc-connector.sh:397`) whose record value is the
  * envelope `{before, after, source{db,table,server_id,ts_ms}, op, ts_ms}`
  * with a stringified-PK record key (`bin/mskc-connector.sh:438`), produced
  * to topic `{prefix}.{db}.{table}` (`bin/mskc-connector.sh:398`,
  * `README.md:436`). We derive the same shape deterministically from
  * `events.parquet` (FIXTURES.md B.1) so a DuckDB oracle can replay it:
  * key = `user_id`, event time = `ts`, op: signup→`c`, error→`d`, rest→`u`.
  *
  * Scale note: the envelope is built with pure column expressions (one
  * narrow projection, no shuffle); `before` needs one window (`lag`) which
  * shuffles once on the key — the same partition-by-PK layout every
  * downstream CDC op reuses.
  */
object ChangeFeed {

  /** Deterministic op mapping, FIXTURES.md B.1. */
  def opFromEventType(eventType: Column): Column =
    when(eventType === "signup", "c")
      .when(eventType === "error", "d")
      .otherwise("u")

  /** Row image carried in `before`/`after` — the "table row" of the feed. */
  private def image(prefix: String = ""): Column =
    struct(
      col("user_id").as("user_id"),
      col("value").as("value"),
      col("props").as("props"))

  /** Full Debezium-shaped envelope, one row per change event.
    *
    * `before` is the previous row image for the key (null for op=`c`,
    * matching Debezium's create events); `after` is null for op=`d`
    * (delete events); `source` mirrors
    * `/root/reference/bin/mskc-connector.sh:398-408` naming.
    */
  def envelope(events: DataFrame,
               topicPrefix: String = "osci.db.mysql-server-1",
               db: String = "cdc_test_db",
               table: String = "person"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val op = opFromEventType(col("event_type"))
    events
      .withColumn("op", op)
      .withColumn("prev_image", lag(image(), 1).over(w))
      .select(
        col("user_id").cast("string").as("key"),
        when(col("op") === "c", lit(null)).otherwise(col("prev_image"))
          .as("before"),
        when(col("op") === "d", lit(null)).otherwise(image()).as("after"),
        struct(
          lit(db).as("db"),
          lit(table).as("table"),
          lit(1L).as("server_id"),
          unix_micros(col("ts")).as("ts_us")).as("source"),
        col("op"),
        unix_micros(col("ts")).as("ts_us"),
        concat_ws(".", lit(topicPrefix), lit(db), lit(table)).as("topic"),
        col("event_id"))
  }
}
