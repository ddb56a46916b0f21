package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Relational query inventory (SURVEY.md §2.B: joins, aggregations,
  * windows, sort/limit, set ops).
  *
  * The reference has no joins/windows of its own (single-table change
  * streams); these enter the inventory because the north star requires an
  * analytics-capable engine around the CDC core (SURVEY.md §2.B note).
  *
  * Determinism: double aggregates go through exact DECIMAL(18,2)
  * arithmetic and only the final value is cast back to double, so Spark
  * and DuckDB agree bitwise regardless of partial-aggregation order.
  * Scale: small dims (region/nation/customer/supplier/part) are
  * broadcast; fact-fact joins shuffle on the join key and rely on AQE.
  */
object RelationalQueries extends QueryPack {

  /** sum(decimal(col)) cast back to double — order-insensitive exact. */
  private def dsum(c: String) =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  def queries: Seq[Q] = Seq(

    // Scan with pushed filter + pruned projection: the plan must show
    // PushedFilters on l_shipdate/l_quantity and a 4-column ReadSchema.
    Q("scan_parquet",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "2000-01-01" && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // TPC-H Q1-style hash aggregation (map-side partials + one shuffle).
    Q("agg_groupby",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          (dsum("l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Star join through two broadcast dims: orders ⋈ customer ⋈ nation.
    // customer/nation are orders-of-magnitude smaller than the fact
    // table at every SF — broadcast them, no fact shuffle.
    Q("join_broadcast",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("revenue"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Fact-fact equi join: lineitem ⋈ orders shuffles both sides on
    // orderkey (sort-merge at scale; AQE may pick broadcast at tiny SF).
    Q("join_shuffle",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          dsum("l_extendedprice").as("total_price"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Bloom semi-join reduction: a selective dim filter prunes the fact
    // side BEFORE the exchange (no false negatives; FPs die in the
    // join) — the oracle is the plain join, asserting value equality.
    Q("join_bloom_pruned",
      (s, d) => {
        val dim = Tables.supplier(s, d)
          .filter(col("s_nationkey") === 3)
          .select("s_suppkey", "s_name")
        BloomPrune.bloomPrunedJoin(
            Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice"),
            dim, "l_suppkey", "s_suppkey", expectedItems = 4096)
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_lines"),
            dsum("l_extendedprice").as("total_price"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin)),

    // A5 delete-by-name semantics (SURVEY §2.A): customers with no
    // order before 1996 (full-table anti is empty at sf≥0.01).
    Q("join_left_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") < "1996-01-01"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey""".stripMargin)),

    // Existence check (SURVEY §2.A F6): customers with a 1995 order.
    Q("join_left_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") < "1996-01-01"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey""".stripMargin)),

    // AS-OF join, Spark-first: instead of a non-equi range join (quadratic
    // per key), union the two event roles and take a running max over one
    // key-partitioned window — single shuffle, linear, scales per key.
    // For each purchase: the latest strictly-earlier click of that user.
    Q("join_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("event_type"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        ev.withColumn("prev_click_ts",
            max(when(col("event_type") === "click", col("ts_us"))).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us", "prev_click_ts")
          .orderBy(col("event_id"))
      },
      Some("""WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        | m AS (
        |  SELECT *, max(CASE WHEN event_type = 'click' THEN ts_us END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS prev_click_ts
        |  FROM t)
        |SELECT event_id, user_id, ts_us, prev_click_ts
        |FROM m WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // Exact distinct aggregation (expands to two-phase agg in Spark).
    Q("agg_distinct",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // HLL sketch — constant memory per group at any scale. Sketch
    // estimates are engine-specific, so the ORACLE-FACING claim is the
    // accuracy CONTRACT, not the estimate: the query computes both the
    // sketch and the exact count and emits whether the estimate landed
    // inside a 5% envelope — a boolean DuckDB can assert exactly
    // (VERDICT r5 item 6: no more no_oracle rows). rsd=0.01 makes 5%
    // a 5σ claim; the default rsd=0.05 made it 1σ, which the sf1
    // replay promptly FALSIFIED (all five groups missed at 15k
    // distinct — dense-mode bias, invisible at sf0.01's near-exact
    // cardinalities). The raw-estimate error distribution stays
    // pinned in SketchSpec.
    Q("agg_approx_distinct",
      // The exact count and the sketch share ONE scan and ONE shuffle:
      // pre-dedup (event_type, user_id) with map-side partial dedup,
      // then count the pairs (= countDistinct) and sketch the deduped
      // user_ids (HLL is duplicate-insensitive, so the estimate is
      // bit-identical to sketching the raw rows). Putting countDistinct
      // and the sketch in one .agg instead plans an Expand that doubles
      // every input row through the exchange — measured 2.26 → 3.93 s
      // drift at sf0.1 as the events scan grew (r7→r8 worst mover).
      // count(user_id), not count(*): a NULL user_id survives the
      // pair-distinct as (event_type, NULL) — counting ROWS would call
      // it a user, where countDistinct/the oracle's count(DISTINCT)
      // skip NULLs. count(col) skips them too, and the group itself
      // still surfaces (n_users = 0) exactly like the old plan's.
      (s, d) => Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type"))
        .agg(count(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
        .select(col("event_type"), col("n_users"),
          (abs(col("approx_users") - col("n_users"))
            <= col("n_users") * 0.05).as("within_5pct"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       TRUE AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ROLLUP over the region→nation hierarchy (customer counts/balance).
    Q("agg_rollup",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum("c_acctbal").as("total_bal"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("total_bal"))
        .orderBy(col("region"), col("nation")),
      Some("""SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin)),

    // CUBE over two independent order dimensions.
    Q("agg_cube",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"))
        .orderBy(col("status"), col("priority")),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin)),

    // GROUPING SETS — independent aggregation lattices in one pass.
    Q("agg_grouping_sets",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupingSets(
          Seq(Seq(col("r_name")), Seq(col("n_name")), Seq.empty),
          col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"))
        .orderBy(col("region"), col("nation")),
      Some("""SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY region, nation""".stripMargin)),

    // PIVOT: status columns out of rows (explicit value list so the
    // plan needs no extra distinct-scan pass).
    Q("agg_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),

    // UNPIVOT (melt) — pivot's inverse: wide measure columns become
    // (metric, value) rows via Spark's native unpivot operator (a
    // zero-shuffle Expand, rows × #measures). The oracle states it as
    // the portable UNION ALL of per-measure projections.
    Q("agg_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 50 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")),
          "metric", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
      Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber,
        |         'l_quantity' AS metric, l_quantity AS value
        |  FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |         'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey % 50 = 0) t
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // NULL-SAFE JOIN (<=> / IS NOT DISTINCT FROM): null keys MATCH
    // each other — the semantic plain equi-joins silently drop.
    // Sides are pre-aggregated to key cardinality before the join
    // (never join-then-aggregate across a null bucket: the null key
    // is one giant hot group by construction — aggregate-first makes
    // the join input |keys| rows regardless of skew).
    Q("join_null_safe",
      (s, d) => {
        def side(et: String, as: String) = Tables.events(s, d)
          .filter(col("event_type") === et)
          .select(nullif(col("user_id") % 10, lit(0)).as("key"))
          .groupBy("key").agg(count(lit(1)).as(as))
        val l = side("view", "n_views")
        val r = side("purchase", "n_purchases")
        l.join(r, l("key") <=> r("key"), "inner")
          .select(l("key"), col("n_views"), col("n_purchases"))
          .orderBy(col("key"))
      },
      Some("""WITH l AS (
        |  SELECT nullif(user_id % 10, 0) AS key, count(*) AS n_views
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        | r AS (
        |  SELECT nullif(user_id % 10, 0) AS key, count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT l.key, n_views, n_purchases
        |FROM l JOIN r ON l.key IS NOT DISTINCT FROM r.key
        |ORDER BY l.key NULLS FIRST""".stripMargin)),

    // BOUNDED moving average (ROWS 6 PRECEDING..CURRENT): the frame
    // shape win_running_sum (unbounded) and win_range_between (time
    // RANGE) don't cover. Decimal-exact sum over the frame, divided
    // as double — bit-identical across engines.
    Q("win_moving_avg",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            (sum(col("value").cast("decimal(18,2)")).over(w)
              .cast("double") /
              count(col("value")).over(w)).as("ma7"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) /
        |    count(value) OVER w AS ma7
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),

    // LEFT OUTER join — dimension-preserving enrichment: every
    // customer survives, order-less customers zero-filled. The rollup
    // aggregates BEFORE the join (orders collapse to customer
    // cardinality first), and the dim side broadcasts.
    Q("join_left_outer",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            dsum("o_totalprice").as("spend"))
        Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("spend"), lit(0.0)).as("spend"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH ord AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, c_name,
        |       coalesce(n_orders, 0) AS n_orders,
        |       coalesce(spend, 0.0) AS spend
        |FROM customer LEFT JOIN ord ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin)),

    // FULL OUTER join — reconciliation of two keyed summaries with
    // rows unique to each side (the moduli make both null sides
    // non-empty at every SF): the USING key coalesces, absent counts
    // zero-fill. Both sides pre-aggregate to key cardinality.
    Q("join_full_outer",
      (s, d) => {
        def side(et: String, mod: Int, as: String) = Tables.events(s, d)
          .filter(col("event_type") === et &&
            col("user_id") % mod === 0)
          .groupBy("user_id").agg(count(lit(1)).as(as))
        side("view", 3, "n_views")
          .join(side("purchase", 2, "n_purchases"), Seq("user_id"),
            "full_outer")
          .select(col("user_id"),
            coalesce(col("n_views"), lit(0L)).as("n_views"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
          .orderBy(col("user_id"))
      },
      Some("""WITH v AS (
        |  SELECT user_id, count(*) AS n_views FROM events
        |  WHERE event_type = 'view' AND user_id % 3 = 0
        |  GROUP BY user_id),
        | p AS (
        |  SELECT user_id, count(*) AS n_purchases FROM events
        |  WHERE event_type = 'purchase' AND user_id % 2 = 0
        |  GROUP BY user_id)
        |SELECT user_id, coalesce(n_views, 0) AS n_views,
        |       coalesce(n_purchases, 0) AS n_purchases
        |FROM v FULL JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin)),

    // CORRELATION from exact decimal moments: Σx, Σy, Σxy, Σx², Σy²
    // accumulate as DECIMAL (order-insensitive, partial-mergeable),
    // and Pearson r is computed from the five exact sums in one final
    // double expression — bit-identical across engines where native
    // corr()'s running-merge would not be. The same trick as
    // agg_stats, extended to cross-moments.
    Q("agg_corr_exact",
      (s, d) => {
        val x = col("l_quantity").cast("decimal(18,2)")
        val y = col("l_extendedprice").cast("decimal(18,2)")
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(x).as("sx"), sum(y).as("sy"),
            sum((x * y).cast("decimal(28,4)")).as("sxy"),
            sum((x * x).cast("decimal(28,4)")).as("sxx"),
            sum((y * y).cast("decimal(28,4)")).as("syy"))
          .select(col("l_returnflag"), col("n"),
            round(
              (col("n").cast("double") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
              (sqrt(col("n").cast("double") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double")) *
                sqrt(col("n").cast("double") * col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double"))),
              6).as("corr_qty_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))
        |        AS DECIMAL(28,4))) AS sxy,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))
        |        AS DECIMAL(28,4))) AS sxx,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))
        |        AS DECIMAL(28,4))) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        |    6) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Moment statistics from EXACT decimal sums (Σx, Σx²) so
    // mean/variance/stddev are bit-identical across engines —
    // native stddev partial-merge order would not be.
    Q("agg_stats",
      (s, d) => {
        val dec = col("value").cast("decimal(18,2)")
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec).cast("double").as("s1"),
            sum(dec * dec).cast("double").as("s2"))
          .select(col("event_type"), col("n"),
            (col("s1") / col("n")).as("mean"),
            ((col("s2") - col("s1") * col("s1") / col("n")) /
              (col("n") - 1)).as("var_samp"),
            sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
              (col("n") - 1)).as("stddev_samp"))
          .orderBy(col("event_type"))
      },
      Some("""WITH a AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) *
        |             CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, s1 / n AS mean,
        |  (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
        |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp
        |FROM a ORDER BY event_type""".stripMargin)),

    // lead/lag/ntile over the per-user event timeline.
    Q("win_lead_lag",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .select(col("event_id"), col("user_id"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            ntile(4).over(w).as("quartile"))
          .orderBy(col("event_id"))
      },
      Some("""WITH t AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events)
        |SELECT event_id, user_id,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  ntile(4) OVER w AS quartile
        |FROM t
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY event_id""".stripMargin)),

    // rank() within key partitions (one shuffle + per-partition sort).
    Q("win_rank",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, d)
          .withColumn("bal_rank", rank().over(w))
          .select("c_custkey", "c_nationkey", "c_acctbal", "bal_rank")
          .orderBy(col("c_nationkey"), col("bal_rank"), col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
        |  rank() OVER (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
        |FROM customer
        |ORDER BY c_nationkey, bal_rank, c_custkey""".stripMargin)),

    // Distribution window functions: percent_rank / cume_dist / ntile —
    // same single key-shuffle + per-partition sort as rank; the outputs
    // are exact rational arithmetic ((rank-1)/(n-1), rows≤cur/n), so
    // both engines produce identical doubles.
    Q("win_distribution",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.customer(s, d)
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .withColumn("decile", ntile(10).over(w))
          .select("c_custkey", "c_nationkey", "c_acctbal",
            "pct_rank", "cume", "decile")
          .orderBy(col("c_nationkey"), col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  ntile(10) OVER w AS decile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin)),

    // Running sum per key — DECIMAL inside the frame so Spark's sequential
    // fold and DuckDB's segment-tree evaluation agree exactly.
    Q("win_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("running_spend",
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double"))
          .select("o_orderkey", "o_custkey", "running_spend")
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Top-k per group via row_number — no global sort, prunes to k rows
    // per partition before any data leaves the exchange.
    Q("top_k_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),

    // Payload-carrying ranked top-k via the graft_topk_rows aggregate
    // (the TopKRewrite target shape, exercised directly): map-side
    // bounded buffers carry (price, orderkey, custkey-payload) — the
    // "SELECT * under rank" pattern without shuffling every row. The
    // ordering key (price, orderkey) is unique per row, so rank() is
    // deterministic and the DuckDB window formulation is an exact
    // oracle.
    Q("top_k_payload",
      (s, d) => {
        val tk = org.apache.spark.sql.graft.Native.topkRows(
          col("o_totalprice"), col("o_orderkey"),
          struct(col("o_custkey").as("o_custkey")), 3, 1)
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(tk.as("tk"))
          .select(col("o_orderpriority"), explode(col("tk")).as("e"))
          .select(col("o_orderpriority"), col("e.rk").as("rn"),
            col("e.id").as("o_orderkey"), col("e.v").as("o_totalprice"),
            col("e.p.o_custkey").as("o_custkey"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice, o_custkey
        |FROM (
        |  SELECT *, rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),

    // Global top-N: Spark plans TakeOrderedAndProject — per-partition
    // heaps + driver merge of N rows, never a full sort at scale.
    Q("sort_limit",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin)),

    // Co-located (bucketed) join — the recurring-join layout: both
    // sides written bucketed+sorted on the join key, so the join plans
    // with ZERO Exchange (asserted in QueryInventorySpec) — at 100 TB
    // this is the difference between an in-place merge and re-shuffling
    // the lake per query. The write happens inside the query (idempotent
    // drop+recreate) so the driver grades the full layout→join path.
    Q("join_bucketed_colocated",
      (s, d) => {
        Layout.writeBucketed(
          Tables.orders(s, d).select("o_orderkey", "o_custkey",
            "o_totalprice"),
          "orders_colo", Seq("o_orderkey"), numBuckets = 8)
        Layout.writeBucketed(
          Tables.lineitem(s, d).select("l_orderkey", "l_quantity",
            "l_extendedprice"),
          "lineitem_colo", Seq("l_orderkey"), numBuckets = 8)
        Layout.readTable(s, "orders_colo")
          .join(Layout.readTable(s, "lineitem_colo"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // Z-ORDERED LAYOUT round trip — the multi-dimensional data-skipping
    // layout (Delta/Iceberg Z-ORDER): events rewritten clustered on
    // BOTH (user_id, event time) via Morton interleave
    // (Layout.writeZOrdered, codegen'd graft_zorder kernel), then a
    // 2-d range slice is answered from the clustered copy. The oracle
    // computes the same slice from the raw table, so the driver grades
    // layout → scan → filter end to end; ZOrderSpec separately asserts
    // the clustering effect (per-file min/max tight on BOTH dims, files
    // actually skipped). At 100 TB this is the difference between a
    // 2-d slice reading a handful of files and scanning the lake on
    // the non-leading dimension.
    Q("layout_zorder_slice",
      (s, d) => {
        val zDir = QueryPack.scratch("zorder_q", d)
        Layout.writeZOrdered(
          Tables.events(s, d)
            .select(col("event_id"), col("user_id"),
              unix_micros(col("ts")).as("ts_us"), col("event_type"),
              col("value")),
          zDir, "user_id", "ts_us", bits = 12, numFiles = 16)
        s.read.parquet(zDir)
          .filter(col("user_id").between(3, 9) &&
            col("ts_us") >= 1704844800000000L && // 2024-01-10
            col("ts_us") < 1705708800000000L) // 2024-01-20
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 3 AND 9
        |  AND epoch_us(ts) >= 1704844800000000
        |  AND epoch_us(ts) < 1705708800000000
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Set algebra (SURVEY §2.A A5 config-array append/remove semantics).
    Q("set_union",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderdate") < "1996-01-01").select("o_custkey")
          .union(o.filter(col("o_orderdate") >= "2000-01-01")
            .select("o_custkey"))
          .distinct()
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |ORDER BY o_custkey""".stripMargin)),

    Q("set_intersect",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderdate") < "1996-01-01").select("o_custkey")
          .intersect(o.filter(col("o_orderdate") >= "2000-01-01")
            .select("o_custkey"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |ORDER BY o_custkey""".stripMargin)),

    Q("set_except",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderdate") < "1996-01-01").select("o_custkey")
          .except(o.filter(col("o_orderdate") >= "2000-01-01")
            .select("o_custkey"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |ORDER BY o_custkey""".stripMargin))
  )
}
