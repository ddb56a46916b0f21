package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.sources.Tables

/** Second relational batch: session windows, time-range frames, exact
  * percentiles, non-equi band joins, skew-salted joins, explode, math kit.
  *
  * These extend SURVEY.md §2.B's "Aggregations / Windows / Joins /
  * String-date-math-json" rows with the operators a training-data /
  * event-analytics pipeline leans on at 100 TB. Scale notes per query:
  * the band join is a bucketed equi-join (never a nested loop over the
  * fact table), the salted join spreads a hot key over `saltFactor`
  * sub-partitions, the session window is Spark's native `session_window`
  * state machine (streaming-reusable), and range frames stay on one
  * key-partitioned sort — exactly one shuffle each.
  */
object AnalyticQueries extends QueryPack {

  private def dsum(c: String) =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  /** 30-minute session gap, in microseconds. */
  private val GapUs = 1800000000L

  /** ±60 s neighbor band, in microseconds. */
  private val BandUs = 60000000L

  def queries: Seq[Q] = Seq(

    // Flagship composite star query (TPC-H Q5 shape): a six-table
    // snowflake join with a selective region/date slice feeding a
    // decimal-exact revenue rollup. This is the query the whole stack
    // exists for — Catalyst broadcast-plans every dim, pushes the date
    // window into the orders scan and the region name into its scan,
    // and only the lineitem⋈orders equi-join shuffles. Revenue goes
    // decimal(18,2)×decimal(18,2) → exact sum → one final double cast,
    // so the hash oracle holds across engines.
    Q("q_star_revenue",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= "1996-01-01" &&
              col("o_orderdate") < "1997-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d))
            .filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)"))
          .cast("double").as("discount_revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS discount_revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Gap-based sessionization with Spark's native session_window —
    // the same operator Structured Streaming uses for stateful session
    // aggregation, here in batch mode. One shuffle on user_id; session
    // merge is a per-key linear scan. DuckDB oracle reconstructs the
    // identical semantics (a new session starts when the gap since the
    // previous event is >= 30 min; session end = last event + gap).
    Q("stream_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum("value").as("session_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start_us")),
      Some(s"""WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
        |b AS (
        |  SELECT user_id, ts_us, value,
        |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |           ORDER BY ts_us) >= $GapUs THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |sids AS (
        |  SELECT user_id, ts_us, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM b)
        |SELECT user_id, min(ts_us) AS session_start_us,
        |       max(ts_us) + $GapUs AS session_end_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS session_value
        |FROM sids GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin)),

    // Time-RANGE frame: trailing-30-day spend per customer. RANGE (not
    // ROWS) so peers at the same date aggregate identically regardless
    // of physical order — deterministic under ties by construction.
    // One shuffle on o_custkey, one per-partition sort.
    Q("win_range_between",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("od_us"))
          .rangeBetween(-30L * 86400000000L, 0L)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
            col("o_totalprice"))
          .withColumn("trailing_30d_spend",
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double"))
          .select("o_orderkey", "o_custkey", "trailing_30d_spend")
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |    RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) AS trailing_30d_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Exact interpolated percentiles. l_quantity holds integral doubles
    // and p*(n-1) fractions are dyadic (0/.25/.5/.75), so the linear
    // interpolation is exact in binary — bitwise-identical across
    // engines with no rounding crutch. Single-pass sort-based aggregate
    // per group (constant group count here; at scale prefer
    // approx_percentile for sketch-mergeable partials).
    Q("agg_percentile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // Non-equi band join done the scale way: bucket time into band-width
    // cells, explode ONE side to its 3 candidate cells, equi-join on the
    // cell id, then apply the exact |Δts| predicate. Each qualifying
    // pair lands in exactly one (left-cell, right-cell) combination, so
    // no distinct pass is needed. The oracle replays the same bucketing
    // identity (a |Δ| ≤ band pair spans at most adjacent cells, and the
    // right side carries one cell per row, so each pair is counted
    // exactly once) — the naive non-equi IEJoin form exceeded 900 s at
    // the sf10 replica while this equi-join form replays in ~2 min;
    // both forms hash-verified identical at sf0.01.
    Q("join_range",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
        val left = e.withColumn("cell",
          explode(array(expr(s"ts_us div $BandUs") - 1,
            expr(s"ts_us div $BandUs"),
            expr(s"ts_us div $BandUs") + 1)))
        val right = e.select(col("event_id").as("e2"),
            col("ts_us").as("ts2"))
          .withColumn("cell", expr(s"ts2 div $BandUs"))
        left.join(right, "cell")
          .filter(abs(col("ts_us") - col("ts2")) <= BandUs &&
            col("event_id") =!= col("e2"))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_neighbors"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
        | r AS (SELECT event_id AS e2, ts_us AS ts2,
        |              ts_us // $BandUs AS cell FROM e),
        | l AS (SELECT event_id, ts_us,
        |         unnest([ts_us // $BandUs - 1, ts_us // $BandUs,
        |                 ts_us // $BandUs + 1]) AS cell
        |       FROM e)
        |SELECT l.event_id, count(*) AS n_neighbors
        |FROM l JOIN r USING (cell)
        |WHERE abs(l.ts_us - r.ts2) <= $BandUs AND l.event_id <> r.e2
        |GROUP BY l.event_id ORDER BY l.event_id""".stripMargin)),

    // First-class AS-OF join API (graft.ops.AsOf) with a 1-hour
    // tolerance: latest click ≤ each purchase, union + one
    // key-partitioned running frame — one shuffle, linear per key.
    // The oracle keeps the independent argmax DEFINITION but bounds
    // the candidate set with hour-cell bucketing (the join_range
    // precedent): a click within the 1-hour tolerance of a purchase
    // lies in the purchase's hour cell or the one before, and each
    // click carries ONE cell, so every qualifying pair appears exactly
    // once. The naive non-equi argmax replay was the r11 oracle-growth
    // detector's one superlinear flag — 360 s at the sf10 replica
    // (Σ per-user |purchases|·|clicks|); this equi-join form replays
    // the identical rows (hash-verified at sf0.1) in 12 s there.
    Q("join_asof_tolerance",
      (s, d) => {
        val p = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_ts"))
        val c = Tables.events(s, d)
          .filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("c_ts"),
            col("event_id").as("click_id"))
        AsOf.joinLatest(p, c, Seq("user_id"), "p_ts", "c_ts",
            rightPayload = Seq("click_id"), tieBreak = Some("click_id"),
            toleranceUs = Some(3600000000L))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS MATERIALIZED (
        |  SELECT event_id, user_id, epoch_us(ts) AS p_ts FROM events
        |  WHERE event_type = 'purchase'),
        | c AS MATERIALIZED (
        |  SELECT user_id, epoch_us(ts) AS c_ts, event_id AS click_id,
        |         epoch_us(ts) // 3600000000 AS cell
        |  FROM events WHERE event_type = 'click'),
        | cand AS (
        |  SELECT pl.event_id, c.click_id, c.c_ts
        |  FROM (SELECT event_id, user_id, p_ts,
        |          unnest([p_ts // 3600000000 - 1, p_ts // 3600000000])
        |            AS cell
        |        FROM p) pl
        |  JOIN c ON pl.user_id = c.user_id AND pl.cell = c.cell
        |  WHERE c.c_ts <= pl.p_ts AND pl.p_ts - c.c_ts <= 3600000000),
        | w AS (
        |  SELECT event_id, click_id, c_ts,
        |         row_number() OVER (PARTITION BY event_id
        |           ORDER BY c_ts DESC, click_id DESC) AS rn
        |  FROM cand)
        |SELECT p.event_id, p.user_id, p_ts, w.click_id, w.c_ts AS asof_ts
        |FROM p LEFT JOIN (SELECT * FROM w WHERE rn = 1) w
        |  USING (event_id)
        |ORDER BY event_id""".stripMargin)),

    // Skew-salted fact join (graft.ops.Skew): the probe side's key space
    // is spread over 8 deterministic salt buckets and the build side
    // replicated to match — result provably equals the plain equi-join,
    // which is exactly what the oracle asserts. For the hot-key change
    // stream case SURVEY.md §7.2 calls out.
    Q("join_skew_salted",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        Skew.saltedJoin(li, ord, Seq("l_orderkey"), 8,
            xxhash64(col("l_orderkey"), col("l_linenumber")))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_lines"), dsum("l_quantity").as("sum_qty"),
            dsum("l_extendedprice").as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // TARGETED skew handling: hot keys (sampled estimate) salted, cold
    // keys joined plain, union — result provably equals the plain join
    // (the oracle), whatever the sample flags. events.user_id is the
    // low-cardinality hot-key side; the per-user dim comes from the
    // same table.
    Q("join_skew_adaptive",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val dim = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("first_seen_us"))
        Skew.adaptiveSaltedJoin(ev, dim, Seq("user_id"), 8,
            xxhash64(col("event_id")), hotThreshold = 50L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum("value").as("total_value"),
            min(col("first_seen_us")).as("earliest_first_seen"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dim AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_seen_us
        |  FROM events GROUP BY user_id)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value,
        |  min(d.first_seen_us) AS earliest_first_seen
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    // Generator / flatten: explode(split) — word frequencies over part
    // names. Generate in the map stage, aggregate with map-side
    // partials; no data explosion survives past the partial agg.
    Q("fn_explode",
      (s, d) => Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("word")),
      Some("""SELECT word, count(*) AS n_parts FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
        |GROUP BY word ORDER BY word""".stripMargin)),

    // Sliding (hopping) event-time windows: 1 h length, 15 min hop ⇒
    // every event lands in exactly 4 windows. Spark's `window` generates
    // the 4 assignments in the map stage (no self-join); the oracle
    // reconstructs identical window starts with a 4-offset cross join.
    Q("stream_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("n"), col("total_value"))
        .orderBy(col("w_start_us")),
      Some("""WITH t AS (SELECT epoch_us(ts) AS ts_us, value FROM events),
        | assigned AS (
        |  SELECT ((ts_us // 900000000) - i) * 900000000 AS w_start_us, value
        |  FROM t CROSS JOIN generate_series(0, 3) AS g(i))
        |SELECT w_start_us, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM assigned GROUP BY w_start_us
        |ORDER BY w_start_us""".stripMargin)),

    // Custom TypedImperativeAggregate top-k (graft_topk): partial
    // k-bounded heaps combine map-side, so at most k·partitions pairs
    // per group cross the exchange — versus the window row_number
    // formulation (`top_k_per_group`) which shuffles + sorts EVERY row.
    // Same total order (value desc, id asc), so the SAME DuckDB oracle
    // hash-verifies both plans.
    Q("top_k_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(Native.topk(col("o_totalprice"), col("o_orderkey"), 3).as("tk"))
        .select(col("o_orderpriority"), posexplode(col("tk")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("int").as("rn"),
          col("col.id").as("o_orderkey"),
          col("col.v").as("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn")),
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),

    // DataSketches HLL: mergeable sketch partials — the re-aggregatable
    // form of distinct counting (union per-day sketches ≡ sketch of the
    // union; proved in SketchSpec). Estimates are sketch-specific, so
    // the oracle asserts the ACCURACY ENVELOPE instead (lgK=12 ⇒ ~1.6%
    // rse; 5% is >3 standard errors): exact count plus a within-bound
    // boolean, hash-comparable in DuckDB at any SF.
    Q("agg_hll_sketch",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .as("est_users"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("event_type"), col("n_users"),
          (abs(col("est_users") - col("n_users"))
            <= col("n_users") * 0.05).as("within_5pct"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       TRUE AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Sketch quantiles — THE unbounded-group percentile path at 100 TB
    // (SCALE.md): GK summaries are mergeable partials with an ε rank
    // bound, so no group ever materializes its value list (contrast
    // agg_percentile's exact sort-based path). Estimates are
    // merge-order-specific, so the oracle asserts the RANK GUARANTEE
    // itself: re-join the estimates against the values and check the
    // realized rank of each estimate sits within p ± 1% (ε=1/10000
    // plus discreteness slack) — booleans DuckDB hash-verifies at any
    // SF, including ones where the sketch path is genuinely
    // approximate. Exactness-under-repartition and the raw error
    // envelope stay pinned in ApproxPercentileSpec.
    Q("agg_approx_percentile",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        val est = ev.groupBy(col("event_type"))
          .agg(percentile_approx(col("value"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pcts"))
          .select(col("event_type"),
            col("pcts").getItem(0).as("p50"),
            col("pcts").getItem(1).as("p90"),
            col("pcts").getItem(2).as("p99"))
        def rankOk(p: Double, c: Column): Column = {
          val le = avg((col("value") <= c).cast("double"))
          val lt = avg((col("value") < c).cast("double"))
          // upper bound clamped BELOW 1.0: at p=0.99 a naive p+0.01
          // is 1.0 and vacuously true for any estimate above the
          // group's maximum (ADVICE r6) — the sketch returns a member
          // value, so also assert membership's consequence directly:
          // at least one value sits at or above the estimate
          val notAboveMax = max((col("value") >= c).cast("int")) === 1
          le >= p - 0.01 && lt <= math.min(p + 0.01, 1.0 - 1e-9) &&
            notAboveMax
        }
        ev.join(broadcast(est), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_values"),
            rankOk(0.5, col("p50")).as("ok50"),
            rankOk(0.9, col("p90")).as("ok90"),
            rankOk(0.99, col("p99")).as("ok99"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n_values,
        |       TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // first/last/nth value over an explicit full-partition frame (the
    // default frame would make last_value = current row — the classic
    // trap; stating ROWS UNBOUNDED..UNBOUNDED on both engines keeps it
    // deterministic and meaningful).
    Q("win_first_last",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .select(col("event_id"), col("user_id"),
            first(col("value")).over(w).as("first_value"),
            last(col("value")).over(w).as("last_value"),
            nth_value(col("value"), 2).over(w).as("second_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH t AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events)
        |SELECT event_id, user_id,
        |  first_value(value) OVER w AS first_value,
        |  last_value(value) OVER w AS last_value,
        |  nth_value(value, 2) OVER w AS second_value
        |FROM t
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin)),

    // Scalar-subquery shape: rows above the GLOBAL mean. The 1-row
    // aggregate is broadcast against the fact scan (no shuffle of the
    // big side); decimal-exact mean so both engines compare against the
    // same double.
    Q("filter_scalar_subquery",
      (s, d) => {
        val avgPrice = Tables.orders(s, d)
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            count(lit(1))).cast("double").as("avg_price"))
        Tables.orders(s, d)
          .join(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_price"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) / count(*)
        |              AS DOUBLE)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin)),

    // Math kit: floor/ceil/abs/sign/mod exact; sqrt IEEE-correctly
    // rounded (bitwise portable); ln rounded to 6 dp to absorb the
    // ≤1-ulp libm divergence between engines.
    Q("fn_math",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice")).cast("long").as("fl"),
          ceil(col("l_extendedprice")).cast("long").as("ce"),
          abs(col("l_discount") - 0.05).as("ab"),
          signum(col("l_discount") - 0.05).as("sg"),
          expr("l_orderkey % 7").as("md"),
          sqrt(col("l_extendedprice")).as("sq"),
          round(log(col("l_extendedprice")), 6).as("ln6"),
          pow(col("l_quantity"), 2).as("qsq"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  abs(l_discount - 0.05) AS ab,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
        |  l_orderkey % 7 AS md,
        |  sqrt(l_extendedprice) AS sq,
        |  round(ln(l_extendedprice), 6) AS ln6,
        |  pow(l_quantity, 2) AS qsq
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // GAPS AND ISLANDS — activity streaks: consecutive active DAYS
    // collapse into islands via the classic ordinal-difference trick
    // (day − row_number is constant within a run), then per-user
    // longest streak + streak count. One distinct shuffle + one
    // key-partitioned window + one group-by, all on user_id — the
    // exchanges collapse to a single key layout. All-integer
    // arithmetic ⇒ bit-exact across engines.
    Q("win_gaps_islands",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("day"))
        val days = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val streaks = days
          .withColumn("grp", col("day") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
        streaks.groupBy(col("user_id"))
          .agg(max(col("len")).as("longest_streak"),
            count(lit(1)).as("n_streaks"))
          .orderBy(col("user_id"))
      },
      Some("""WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        | isl AS (
        |  SELECT user_id, day,
        |         day - row_number() OVER (PARTITION BY user_id
        |                                  ORDER BY day) AS grp
        |  FROM days),
        | streaks AS (
        |  SELECT user_id, grp, count(*) AS len
        |  FROM isl GROUP BY user_id, grp)
        |SELECT user_id, max(len) AS longest_streak,
        |       count(*) AS n_streaks
        |FROM streaks GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ORDERED EVENT FUNNEL (view → click → purchase): per-step user
    // counts where each step's event must occur AT OR AFTER the user's
    // previous step. Three conditional min-aggregations, each shuffling
    // on user_id (co-partitioned: the step joins reuse the same key
    // layout, AQE-broadcast as the funnel narrows) — never a
    // sort-the-whole-history sessionization. avg step latency ships as
    // a raw sum/count division (integer-ratio: rounding would diverge
    // between engines — QueryPack scaladoc).
    Q("pipeline_event_funnel",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("ts_us"))
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_us").as("t1"))
        val t2 = ev.filter(col("event_type") === "click")
          .join(t1, "user_id").filter(col("ts_us") >= col("t1"))
          .groupBy("user_id")
          .agg(min("ts_us").as("t2"), min("t1").as("t1"))
        val t3 = ev.filter(col("event_type") === "purchase")
          .join(t2, "user_id").filter(col("ts_us") >= col("t2"))
          .groupBy("user_id")
          .agg(min("ts_us").as("t3"), min("t2").as("t2"))
        def step(name: String, df: org.apache.spark.sql.DataFrame,
                 fromCol: String, toCol: String) =
          df.agg(
            lit(name).as("step"),
            count(lit(1)).as("n_users"),
            (sum(col(toCol) - col(fromCol)).cast("double") /
              count(lit(1))).as("avg_us_from_prev"))
        step("1_view", t1, "t1", "t1")
          .unionByName(step("2_click", t2, "t1", "t2"))
          .unionByName(step("3_purchase", t3, "t2", "t3"))
          .select("step", "n_users", "avg_us_from_prev")
          .orderBy(col("step"))
      },
      Some("""WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        | s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
        |        WHERE event_type = 'view' GROUP BY user_id),
        | s2 AS (SELECT e.user_id, min(e.ts_us) AS t2, min(s1.t1) AS t1
        |        FROM ev e JOIN s1 USING (user_id)
        |        WHERE e.event_type = 'click' AND e.ts_us >= s1.t1
        |        GROUP BY e.user_id),
        | s3 AS (SELECT e.user_id, min(e.ts_us) AS t3, min(s2.t2) AS t2
        |        FROM ev e JOIN s2 USING (user_id)
        |        WHERE e.event_type = 'purchase' AND e.ts_us >= s2.t2
        |        GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT '1_view' AS step, count(*) AS n_users,
        |         CAST(CAST(sum(t1 - t1) AS BIGINT) AS DOUBLE) / count(*)
        |           AS avg_us_from_prev
        |  FROM s1
        |  UNION ALL
        |  SELECT '2_click', count(*),
        |         CAST(CAST(sum(t2 - t1) AS BIGINT) AS DOUBLE) / count(*)
        |  FROM s2
        |  UNION ALL
        |  SELECT '3_purchase', count(*),
        |         CAST(CAST(sum(t3 - t2) AS BIGINT) AS DOUBLE) / count(*)
        |  FROM s3)
        |ORDER BY step""".stripMargin))
  )
}
