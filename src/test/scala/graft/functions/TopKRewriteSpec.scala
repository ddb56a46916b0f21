package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKRewrite

import graft.SparkSpec

/** TopKRewriteRule: the window-top-k pattern is rewritten into the
  * graft_topk aggregate exactly when lossless, results are identical
  * (ties and null values included), and ineligible shapes are left
  * untouched.
  */
class TopKRewriteSpec extends SparkSpec {

  // Seq.toDF gives non-nullable primitives — the id non-null requirement
  private def df: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 7.0, 3L), ("a", 1.0, 4L),
      ("b", 2.0, 5L), ("b", 2.0, 6L),
      ("c", 9.0, 7L)).toDF("grp", "v", "id")
  }

  private def topkQuery(d: DataFrame) = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("v").desc, col("id"))
    d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("grp", "rn", "id", "v")
  }

  private def optimizedPlan(d: DataFrame): String =
    topkQuery(d).queryExecution.optimizedPlan.toString

  private def withRule[T](body: => T): T = {
    TopKRewrite.enable(spark)
    try body finally TopKRewrite.disable(spark)
  }

  test("rule rewrites the pattern: aggregate + generate, no Window") {
    val before = optimizedPlan(df)
    assert(before.contains("Window"), before)
    withRule {
      val after = optimizedPlan(df)
      assert(!after.contains("Window"), after)
      assert(after.contains("graft_topk"), after)
      assert(after.contains("Generate posexplode"), after)
    }
  }

  test("rewritten results equal the window results (ties included)") {
    val expected = topkQuery(df).collect().toSet
    val got = withRule { topkQuery(df).collect().toSet }
    assert(got === expected)
    assert(got.size === 5) // a:2, b:2, c:1
  }

  test("null v values rank last, identically in both plans") {
    import spark.implicits._
    val d = Seq(("a", Some(5.0), 1L), ("a", None, 2L), ("a", None, 3L),
      ("b", None, 4L)).toDF("grp", "v", "id")
    val expected = topkQuery(d).collect().toSet
    val got = withRule { topkQuery(d).collect().toSet }
    assert(got === expected)
    // group b must surface its null row at rn=1 in both
    assert(expected.exists(r => r.getString(0) == "b" && r.isNullAt(3)))
  }

  // ties in the FULL ordering key (v, id) — the only way rank can
  // diverge from row_number under this total order
  private def tiedDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 9.0, 0L, "w"), ("a", 7.0, 1L, "x"), ("a", 7.0, 1L, "y"),
      ("a", 5.0, 2L, "z"),
      ("b", 2.0, 5L, "p"), ("b", 2.0, 5L, "q"), ("b", 2.0, 5L, "r"),
      ("b", 1.0, 6L, "s")).toDF("grp", "v", "id", "payload")
  }

  private def rankQuery(d: DataFrame, fn: org.apache.spark.sql.Column) = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("v").desc, col("id"))
    d.withColumn("rn", fn.over(w))
      .filter(col("rn") <= 2)
      .select("grp", "rn", "id", "v")
  }

  // multiset compare: tied rows are IDENTICAL rows, a Set would collapse
  private def rows(d: DataFrame): Seq[String] =
    d.collect().map(_.toString).toSeq.sorted

  test("rank() is rewritten; boundary ties all surface, ranks match") {
    val expected = rows(rankQuery(tiedDf, rank()))
    // NB: rebuild the Dataset inside withRule — queryExecution is cached
    val (plan, got) = withRule {
      val q = rankQuery(tiedDf, rank())
      (q.queryExecution.optimizedPlan.toString, rows(q))
    }
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("graft_topk_rows"), plan)
    assert(got === expected)
    // group b: three rows tied at rank 1 — MORE than k rows survive
    assert(got.count(_.startsWith("[b,")) === 3)
  }

  test("dense_rank() is rewritten; tie groups count once") {
    val expected = rows(rankQuery(tiedDf, dense_rank()))
    val got = withRule {
      val q = rankQuery(tiedDf, dense_rank())
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Window"), plan)
      rows(q)
    }
    assert(got === expected)
    // group a under dense_rank <= 2: ranks 1 (9.0) and 2 (both 7.0 rows)
    assert(got.count(_.startsWith("[a,")) === 3)
  }

  test("payload columns ride through the rewrite unchanged") {
    def q = {
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("v").desc, col("id"))
      tiedDf.filter(col("payload") =!= "y") // unique (v,id) per row
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).select("grp", "rn", "id", "v", "payload")
    }
    val expected = q.collect().toSet
    val (plan, got) = withRule {
      val q2 = q
      (q2.queryExecution.optimizedPlan.toString, q2.collect().toSet)
    }
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("graft_topk_rows"), plan)
    assert(got === expected)
    assert(got.forall(!_.isNullAt(4)))
  }

  test("rank + payload + nulls: full general path equals the window") {
    import spark.implicits._
    val d = Seq(
      ("a", Some(5.0), 1L, "m"), ("a", None, 2L, "n"), ("a", None, 3L, "o"),
      ("b", None, 4L, "p")).toDF("grp", "v", "id", "payload")
    val w = Window.partitionBy(col("grp")).orderBy(col("v").desc, col("id"))
    def q = d.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 2).select("grp", "rn", "id", "v", "payload")
    val expected = q.collect().toSet
    val got = withRule {
      val q2 = q
      assert(!q2.queryExecution.optimizedPlan.toString.contains("Window"))
      q2.collect().toSet
    }
    assert(got === expected)
  }

  test("rewrite preserves the graded top_k_per_group inventory query") {
    def q = graft.SparkEntry.queries("top_k_per_group")(spark,
      "/root/testdata/sf0.001")
    val expected = rows(q)
    val got = withRule {
      val q2 = q
      assert(!q2.queryExecution.optimizedPlan.toString.contains("Window"))
      rows(q2)
    }
    assert(got === expected)
  }

  test("null ids survive the rewrite as NULL, not 0") {
    // regression: the rule's exploded struct declared id non-nullable
    // while the aggregate emits null ids — codegen read 0 silently
    import spark.implicits._
    val d = Seq(("a", Some(9.0), Some(1L)), ("a", Some(8.0), None),
      ("a", Some(7.0), Some(3L)), ("b", None, None))
      .toDF("grp", "v", "id")
    val w = Window.partitionBy(col("grp")).orderBy(col("v").desc, col("id"))
    def q = d.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 2).select("grp", "rn", "id", "v")
    val expected = rows(q)
    val got = withRule {
      val q2 = q
      assert(!q2.queryExecution.optimizedPlan.toString.contains("Window"))
      rows(q2)
    }
    assert(got === expected)
    // the null-id row ranks ABOVE id=3 at v tie-break… here it simply
    // must be present with a NULL id
    assert(got.exists(_.contains("null")))
  }

  test("nullable payload struct rows aggregate without crashing") {
    // regression: a null payload struct was stored as InternalRow.empty,
    // crashing serialize's UnsafeProjection at the partial exchange
    import spark.implicits._
    val d = Seq(("a", 9.0, 1L, Some("x")), ("a", 8.0, 2L, None),
      ("a", 7.0, 3L, Some("z"))).toDF("grp", "v", "id", "pay")
    val tk = org.apache.spark.sql.graft.Native.topkRows(
      col("v"), col("id"),
      when(col("pay").isNotNull, struct(col("pay"))).otherwise(lit(null))
        .cast("struct<pay:string>"), 3, 0)
    val got = d.repartition(3).groupBy("grp").agg(tk.as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id"), col("e.p.pay"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === Set((1L, Some("x")), (2L, None), (3L, Some("z"))))
  }

  test("null payload with NON-nullable fields aggregates safely") {
    // regression: the all-null substitute row crashed the serde
    // projection when the payload schema declared non-nullable fields
    import spark.implicits._
    val d = Seq(("a", 9.0, 1L, 10L), ("a", 8.0, 2L, -1L),
      ("a", 7.0, 3L, 30L)).toDF("grp", "v", "id", "pay")
    // pay is non-nullable from toDF; the when() makes the STRUCT null
    // without widening the field's nullability
    val payload = when(col("pay") > 0, struct(col("pay")))
    val tk = org.apache.spark.sql.graft.Native.topkRows(
      col("v"), col("id"), payload, 3, 0)
    val got = d.repartition(3).groupBy("grp").agg(tk.as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id"), col("e.p.pay"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got === Set((1L, Some(10L)), (2L, None), (3L, Some(30L))))
  }

  test("ascending value order blocks the rewrite") {
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("grp", "rn", "id", "v")
    withRule {
      assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
    }
  }
}
