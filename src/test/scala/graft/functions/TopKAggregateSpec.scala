package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.sources.Tables

/** graft_topk (TypedImperativeAggregate): equivalence with the window
  * row_number formulation, merge correctness across partitionings, and
  * SQL registration.
  */
class TopKAggregateSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("o_orderpriority"))
      .agg(Native.topk(col("o_totalprice"), col("o_orderkey"), k).as("tk"))
      .select(col("o_orderpriority"), posexplode(col("tk")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as("o_orderkey"), col("col.v").as("o_totalprice"))

  test("topk agg equals window row_number top-k") {
    val exp = windowTopK(5).collect().toSet
    val got = aggTopK(Tables.orders(spark, sf), 5).collect().toSet
    assert(got === exp)
  }

  test("topk agg is partitioning-invariant (partial-heap merge)") {
    val base = Tables.orders(spark, sf)
    val a = aggTopK(base.repartition(1), 3).collect().toSet
    val b = aggTopK(base.repartition(13, col("o_orderkey")), 3).collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("topk keeps ties in (value desc, id asc) order") {
    import spark.implicits._
    val df = Seq(("g", 5.0, 30L), ("g", 5.0, 10L), ("g", 5.0, 20L),
      ("g", 7.0, 99L)).toDF("grp", "v", "id")
    val got = df.groupBy(col("grp"))
      .agg(Native.topk(col("v"), col("id"), 3).as("tk"))
      .select(explode(col("tk")).as("p"))
      .select(col("p.v"), col("p.id")).as[(Double, Long)].collect().toSeq
    assert(got === Seq((7.0, 99L), (5.0, 10L), (5.0, 20L)))
  }

  test("topkRows: fixed-width payloads stay associated across serde") {
    // regression: UnsafeProjection's exactly-sized result row aliases
    // its backing array via getBytes — every serialized entry carried
    // the LAST payload until serialize copied the row first.
    import spark.implicits._
    val df = Seq(
      ("g", 9.0, 1L, 101L), ("g", 8.0, 2L, 102L), ("g", 7.0, 3L, 103L),
      ("g", 6.0, 4L, 104L), ("g", 5.0, 5L, 105L))
      .toDF("grp", "v", "id", "pay")
    Seq(df.coalesce(1), df.repartition(4)).foreach { d =>
      val got = d.groupBy("grp")
        .agg(Native.topkRows(col("v"), col("id"),
          struct(col("pay")), 3, 1).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.id"), col("e.p.pay")).as[(Long, Long)]
        .collect().toSeq.sorted
      assert(got === Seq((1L, 101L), (2L, 102L), (3L, 103L)))
    }
  }

  test("graft_topk registered as a SQL function") {
    Native.install(spark)
    Tables.orders(spark, sf).createOrReplaceTempView("orders_tk")
    val n = spark.sql(
      """SELECT o_orderpriority, graft_topk(o_totalprice, o_orderkey, 2) tk
        |FROM orders_tk GROUP BY o_orderpriority""".stripMargin)
      .selectExpr("size(tk)").collect().map(_.getInt(0))
    assert(n.forall(_ === 2))
  }
}
