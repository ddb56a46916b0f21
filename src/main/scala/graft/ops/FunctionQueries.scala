package graft.ops

import org.apache.spark.sql.functions._

import graft.cdc.ChangeFeed
import graft.sources.Tables

/** Record-level transforms, filters and scalar functions
  * (SURVEY.md §2.A P4-P12, F1-F4, S6; §2.B "Projection/filter" +
  * "String/date/math/json fns").
  *
  * Everything here is a narrow projection/filter — zero shuffles except
  * where a group-by is the point. All expressions are built-in
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd); no UDFs.
  */
object FunctionQueries extends QueryPack {

  def queries: Seq[Q] = Seq(

    // P4 — consumers read the current row image: select(after.*).
    Q("envelope_project",
      (s, d) => ChangeFeed.envelope(Tables.events(s, d))
        .filter(col("op") =!= "d")
        .select(col("event_id"),
          col("after.user_id").as("after_user_id"),
          col("after.value").as("after_value"),
          col("after.props").as("after_props"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id AS after_user_id,
        |       value AS after_value, props AS after_props
        |FROM events WHERE event_type <> 'error'
        |ORDER BY event_id""".stripMargin)),

    // F1 — database/table include-list, pushed into the scan
    // (reference: database.include.list, bin/mskc-connector.sh:406).
    Q("include_list_filter",
      (s, d) => Tables.events(s, d)
        .filter(col("user_id").isin(1L, 2L, 3L, 5L, 8L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, count(*) AS n_events
        |FROM events WHERE user_id IN (1, 2, 3, 5, 8)
        |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // F2 — topic regex selection (clean-topics / consume-topic patterns,
    // bin/kafka-client.sh:57,:64).
    Q("topic_regex_filter",
      (s, d) => ChangeFeed.envelope(Tables.events(s, d))
        .filter(col("topic").rlike("^osci\\..*\\.person$"))
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n_records"))
        .orderBy(col("topic")),
      Some("""SELECT 'osci.db.mysql-server-1.cdc_test_db.person' AS topic,
        |       count(*) AS n_records
        |FROM events""".stripMargin)),

    // S6+F3 — error-log grep over synthesized log lines
    // (find-mskc-connector-log-errors, bin/mskc-connector.sh:493-498).
    Q("log_scan",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          concat_ws(" ", col("event_type"), lit("code="),
            col("props")).as("line"))
        .filter(lower(col("line")).rlike("error|failed|exception"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        |       event_type || ' ' || 'code=' || ' ' || props AS line
        |FROM events
        |WHERE regexp_matches(lower(event_type || ' ' || 'code=' || ' ' || props),
        |                     'error|failed|exception')
        |ORDER BY event_id""".stripMargin)),

    // P10/P12 + string kit: lower/upper/split/concat/regexp/length.
    // Bench note (profiled r3): ~1.1 s at sf0.1 decomposes as ~0.5 s
    // ORDER BY (range-partitioner sampling re-evaluates the projection,
    // regex included, before the sort) + ~0.5 s serial execution —
    // events.parquet at sf0.1 is ONE 2 MB row group = one input split,
    // so every per-row kernel runs on a single thread. Neither is a
    // plan defect: the projection is one WholeStageCodegen span with
    // zero pre-sort shuffles, and at real scale the scan has thousands
    // of splits while the sort is the query's stated total-order
    // contract.
    Q("fn_string",
      (s, d) => Tables.events(s, d)
        .select(
          col("event_id"),
          lower(col("event_type")).as("lo"),
          upper(col("event_type")).as("hi"),
          concat_ws(".", col("event_type"),
            col("user_id").cast("string")).as("joined"),
          regexp_extract(col("props"), "[0-9]+", 0).as("digits"),
          length(col("props")).as("n_chars"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        |  lower(event_type) AS lo, upper(event_type) AS hi,
        |  event_type || '.' || CAST(user_id AS VARCHAR) AS joined,
        |  regexp_extract(props, '[0-9]+', 0) AS digits,
        |  CAST(length(props) AS INTEGER) AS n_chars
        |FROM events ORDER BY event_id""".stripMargin)),

    // P11 — date formatting + elapsed-time arithmetic
    // (bin/msk-cluster.sh:100,:129; bin/mskc-connector.sh:353,:478).
    Q("fn_date",
      (s, d) => Tables.events(s, d)
        .select(
          col("event_id"),
          year(col("ts")).as("y"),
          month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("dom"),
          hour(col("ts")).as("h"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
          ((unix_micros(col("ts")) -
            lit(1704067200000000L)) / lit(1000000L)).cast("long")
            .as("secs_since_2024"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        |  CAST(year(ts) AS INTEGER) AS y,
        |  CAST(month(ts) AS INTEGER) AS m,
        |  CAST(day(ts) AS INTEGER) AS dom,
        |  CAST(hour(ts) AS INTEGER) AS h,
        |  strftime(ts, '%Y-%m-%d') AS day_str,
        |  (epoch_us(ts) - 1704067200000000) // 1000000 AS secs_since_2024
        |FROM events ORDER BY event_id""".stripMargin)),

    // P6 — jq-style JSON field extraction over events.props.
    Q("fn_json",
      (s, d) => Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY event_id""".stripMargin)),

    // F4 — jq select(.name == x) equality predicate on an extracted field.
    Q("json_select_by_key",
      (s, d) => Tables.events(s, d)
        .filter(get_json_object(col("props"), "$.k").cast("int") > 80)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_high"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n_high
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 80
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // P9 — base64 of the worker-properties payload (bin/mskc-worker.sh:58).
    Q("fn_base64",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          base64(col("props").cast("binary")).as("b64"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, base64(encode(props)) AS b64
        |FROM events ORDER BY event_id""".stripMargin)),

    // P12 — basename/path manipulation (basename $ARN,
    // bin/mskc-connector.sh:493-494).
    Q("fn_path",
      (s, d) => Tables.events(s, d)
        .select(
          col("event_id"),
          concat(lit("s3://bucket/logs/"), col("event_type"), lit("/"),
            col("event_id").cast("string"), lit(".gz")).as("path"))
        .withColumn("basename",
          element_at(split(col("path"), "/"), -1))
        .orderBy(col("event_id")),
      Some("""WITH p AS (
        |  SELECT event_id,
        |    's3://bucket/logs/' || event_type || '/' ||
        |      CAST(event_id AS VARCHAR) || '.gz' AS path
        |  FROM events)
        |SELECT event_id, path, regexp_extract(path, '[^/]+$', 0) AS basename
        |FROM p ORDER BY event_id""".stripMargin)),

    // Ordered array aggregation surfaced as scalars (collect_list order
    // is shuffle-dependent, so sort before concatenating — array-typed
    // outputs would also be fragile to compare across engines).
    Q("fn_array",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("first_ts_us"),
          max(unix_micros(col("ts"))).as("last_ts_us"),
          concat_ws(",",
            sort_array(collect_list(col("event_type")))).as("types_csv"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, count(*) AS n_events,
        |  min(epoch_us(ts)) AS first_ts_us,
        |  max(epoch_us(ts)) AS last_ts_us,
        |  string_agg(event_type, ',' ORDER BY event_type) AS types_csv
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Regex kit: replace-all, group extraction, boolean match.
    Q("fn_regex",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "#").as("masked"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("k_digits"),
          col("event_type").rlike("^(click|view)$").as("is_browse"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '#', 'g') AS masked,
        |  regexp_extract(props, '"k": ([0-9]+)', 1) AS k_digits,
        |  regexp_matches(event_type, '^(click|view)$') AS is_browse
        |FROM events ORDER BY event_id""".stripMargin)),

    // Streaming-shape tumbling window expressed batch-verifiably:
    // 1-day windows over event time (stream version in graft.streaming).
    Q("stream_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .select(unix_micros(col("w.start")).as("day_us"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("day_us"), col("event_type")),
      Some("""SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY day_us, event_type""".stripMargin)),

    // Stream-stream interval join (click→purchase attribution) in its
    // batch-verifiable form — the IDENTICAL logical definition runs
    // watermarked on two real streams in StreamJoinSpec; the interval
    // bound is what keeps streaming state finite.
    Q("stream_interval_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.streaming.StreamJoin.clickAttribution(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"), "1 hour")
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n_clicks"),
            min(unix_micros(col("click_ts"))).as("first_click_us"))
          .orderBy(col("purchase_id"))
      },
      Some("""SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
        |  min(epoch_us(c.ts)) AS first_click_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin)),

    // WATERMARK LATE-DATA AUDIT, batch-verified. Arrival order is the
    // event-id sequence within each source partition (user_id%8 — the
    // only order Kafka actually guarantees, T2), with a deterministic
    // 1-in-50 slice delayed by 500 positions: the out-of-order tail
    // every real topic has. A row is LATE iff its event time trails
    // the per-partition high-water mark by more than the 4-hour
    // watermark delay — exactly what `withWatermark(..., "4 hours")`
    // drops before state. The running max is per-shard (parallel, no
    // global sort); streaming keeps the same state in one long per
    // partition.
    Q("stream_late_audit",
      (s, d) => {
        val delayUs = 4L * 3600L * 1000000L
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("arr"), col("event_id"))
          .rowsBetween(Long.MinValue, -1)
        Tables.events(s, d)
          .select(col("event_id"), (col("user_id") % 8).as("shard"),
            unix_micros(col("ts")).as("ts_us"), col("event_type"))
          .withColumn("arr", col("event_id") +
            when(col("event_id") % 50 === 0, lit(500L)).otherwise(lit(0L)))
          .withColumn("hwm", max(col("ts_us")).over(w))
          .withColumn("late",
            coalesce(col("hwm") - col("ts_us") > delayUs, lit(false)))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
            max(when(col("late"), col("event_id"))).as("last_late_id"))
          .orderBy(col("event_type"))
      },
      Some("""WITH a AS (
        |  SELECT event_id, user_id % 8 AS shard, epoch_us(ts) AS ts_us,
        |    event_type,
        |    event_id + CASE WHEN event_id % 50 = 0 THEN 500 ELSE 0 END
        |      AS arr
        |  FROM events),
        | w AS (
        |  SELECT *, max(ts_us) OVER (PARTITION BY shard
        |    ORDER BY arr, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM a),
        | f AS (SELECT *,
        |   coalesce(hwm - ts_us > 14400000000, FALSE) AS late FROM w)
        |-- CAST: DuckDB sums INTEGER into HUGEINT; Spark stays BIGINT
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  max(CASE WHEN late THEN event_id END) AS last_late_id
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Deterministic hash split — the train/holdout assignment a
    // training-data pipeline needs: stable across runs, engines and
    // cluster layouts (md5 of the key, no RNG), so the holdout set is
    // reproducible anywhere. Split on the first hex nibble (1/16).
    Q("sample_hash_split",
      (s, d) => Tables.events(s, d)
        .withColumn("split",
          when(substring(md5(col("event_id").cast("string")), 1, 1)
            === "0", lit("holdout")).otherwise(lit("train")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
        .orderBy(col("split")),
      Some("""SELECT CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
        |            = '0' THEN 'holdout' ELSE 'train' END AS split,
        |  count(*) AS n, min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY 1 ORDER BY split""".stripMargin)),

    // Stratified deterministic downsampling: per-class keep rates via
    // md5-nibble membership (purchases kept whole, clicks 1/16, the
    // rest 1/8) — how a corpus rebalances classes reproducibly, with no
    // RNG to coordinate across engines or cluster layouts.
    Q("sample_stratified",
      (s, d) => {
        val nib = substring(md5(col("event_id").cast("string")), 1, 1)
        Tables.events(s, d)
          .filter((col("event_type") === "purchase") ||
            (col("event_type") === "click" && nib === "0") ||
            (col("event_type") =!= "purchase" &&
             col("event_type") =!= "click" && nib.isin("0", "1")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_kept"),
            min(col("event_id")).as("min_id"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n_kept,
        |  min(event_id) AS min_id
        |FROM (SELECT event_type, event_id,
        |        substr(md5(CAST(event_id AS VARCHAR)), 1, 1) AS nib
        |      FROM events)
        |WHERE event_type = 'purchase'
        |   OR (event_type = 'click' AND nib = '0')
        |   OR (event_type NOT IN ('purchase', 'click')
        |       AND nib IN ('0', '1'))
        |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
