package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's [[graft.ops.QueryPack]] into the flat
  * `queries` / `oracleSql` maps the driver verifies (Verify.scala) and
  * benchmarks (Bench.scala).
  */
object SparkEntry {

  /** All query packs; order is display order only. */
  def packs: Seq[QueryPack] = Seq(
    CdcQueries, RelationalQueries, AnalyticQueries, FunctionQueries,
    TextQueries, SimilarityQueries, MultimodalQueries, CorpusStatsQueries)

  private lazy val allQueries: Seq[Q] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_latest_state")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
