package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.ops.SimilarityQueries
import graft.sim.Similarity

/** Native codegen'd vector kernels: bitwise parity with the SQL
  * higher-order-function formulation, null semantics, SQL registration,
  * and a no-fallback codegen run.
  */
class VectorExpressionsSpec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)

  test("native dot is bitwise-identical to the HOF left fold") {
    val pairs = vecs.as("a").crossJoin(vecs.limit(20).as("b"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
    val diff = pairs.select(
      Native.dot(col("x"), col("y")).as("native"),
      Similarity.dotHof(col("x"), col("y")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, "native and HOF dot products diverged")
  }

  test("fused cosine equals dot/(sqrt*sqrt) bitwise") {
    val pairs = vecs.as("a").crossJoin(vecs.limit(20).as("b"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
    val diff = pairs.select(
      Native.cosine(col("x"), col("y")).as("fused"),
      (Native.dot(col("x"), col("y")) /
        (sqrt(Native.dot(col("x"), col("x"))) *
         sqrt(Native.dot(col("y"), col("y"))))).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(diff.isEmpty, "fused cosine diverged from composed form")
  }

  test("null input yields null, not a crash") {
    val row = vecs.limit(1)
      .select(Native.dot(lit(null).cast("array<double>"),
        col("embedding")).as("d"))
      .head()
    assert(row.isNullAt(0))
  }

  test("SQL registration: graft_cosine resolves after install") {
    Native.install(spark)
    vecs.limit(5).createOrReplaceTempView("native_vecs")
    val n = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c,
        |       graft_dot(a.embedding, b.embedding) AS d
        |FROM native_vecs a JOIN native_vecs b ON a.vec_id < b.vec_id""".stripMargin)
      .filter(col("c").isNotNull && col("d").isNotNull).count()
    assert(n === 10)
  }

  test("codegen path compiles (no silent fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = vecs.as("a").crossJoin(vecs.limit(10).as("b"))
        .select(Native.cosine(col("a.embedding"), col("b.embedding")).as("c"))
        .agg(sum(col("c"))).head().getDouble(0)
      assert(!s.isNaN)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
