package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** sql_entry_topk — the pure-SQL-string entry point: the registered
  * graft_cosine resolves, TopKRewriteRule fires on the SQL window
  * top-k (plan has the aggregate, no Window), the child session keeps
  * the rule/view out of the caller's session, and the results equal
  * the DataFrame-API brute-force top-k bit for bit.
  */
class SqlEntrySpec extends SparkSpec {

  private def sqlDf = graft.SparkEntry.queries("sql_entry_topk")(spark, sf)

  test("TopKRewriteRule fires: aggregate form, no Window in the plan") {
    val plan = sqlDf.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_topk_rows"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("rule/view stay in the child session (no caller pollution)") {
    sqlDf.queryExecution.optimizedPlan // forces child-session analysis
    assert(spark.experimental.extraOptimizations.isEmpty ||
      !spark.experimental.extraOptimizations
        .contains(org.apache.spark.sql.graft.TopKRewriteRule))
    assert(!spark.catalog.tableExists("graft_embeddings"))
  }

  test("SQL text ≡ DataFrame-API brute force, bit for bit") {
    val viaSql = sqlDf.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val viaApi = graft.SparkEntry.queries("sim_cosine_topk")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(viaSql.nonEmpty)
    assert(viaSql.sameElements(viaApi))
  }
}
