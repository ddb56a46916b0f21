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

  test("rank() (not row_number) is NOT rewritten") {
    val w = Window.partitionBy(col("grp")).orderBy(col("v").desc, col("id"))
    val q = df.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 2).select("grp", "rn", "id", "v")
    withRule {
      assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
    }
  }

  test("extra payload column blocks the rewrite") {
    import spark.implicits._
    val d = Seq(("a", 5.0, 1L, "x")).toDF("grp", "v", "id", "payload")
    val w = Window.partitionBy(col("grp")).orderBy(col("v").desc, col("id"))
    val q = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("grp", "rn", "id", "v", "payload")
    withRule {
      assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
    }
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
