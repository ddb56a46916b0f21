package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.ops.SimilarityQueries
import graft.sim.Similarity

/** Int8 quantization kernels: bitwise parity with the portable SQL
  * formulation (the same formulation the DuckDB oracle runs), exact
  * integer dot, retrieval quality vs the float path, and edge cases.
  */
class QuantizeI8Spec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)

  /** The portable floor-based quantization rule as Spark SQL functions —
    * executable documentation of exactly what the native kernel (and
    * the DuckDB oracle) compute.
    */
  private def quantizeSql(v: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val m = array_max(transform(v, x => abs(x)))
    when(m === 0, transform(v, _ => lit(0.0)))
      .otherwise(transform(v, x =>
        least(lit(127.0), greatest(lit(-127.0),
          floor(x / (m / lit(127.0)) + lit(0.5))))))
  }

  test("native quantizeI8 matches the floor-based SQL formulation") {
    val diff = vecs.select(
        transform(Native.quantizeI8(col("embedding")),
          b => b.cast("double")).as("native"),
        quantizeSql(col("embedding")).as("sql"))
      .filter(col("native") =!= col("sql"))
    assert(diff.isEmpty, "native and SQL quantization diverged")
  }

  test("dotI8 equals the double dot of the quantized codes, exactly") {
    val coded = vecs.select(col("vec_id"),
      Native.quantizeI8(col("embedding")).as("q"),
      transform(Native.quantizeI8(col("embedding")),
        b => b.cast("double")).as("qd"))
    val pairs = coded.as("a").crossJoin(coded.limit(20).as("b"))
    val diff = pairs.select(
        Native.dotI8(col("a.q"), col("b.q")).cast("double").as("i8"),
        Native.dot(col("a.qd"), col("b.qd")).as("dbl"))
      .filter(col("i8") =!= col("dbl"))
    assert(diff.isEmpty, "integer and double dots over codes diverged")
  }

  test("quantized top-k keeps high recall vs exact float top-k") {
    val queries = vecs.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .select("query_id", "cand_id")
    val quant = Similarity.quantizedTopK(vecs, queries, 5)
      .select("query_id", "cand_id")
    val inter = exact.intersect(quant).count()
    val total = exact.count()
    assert(inter >= (total * 0.6).toLong,
      s"quantized recall too low: $inter/$total")
  }

  test("dirty input pins DuckDB's double-typed semantics: NaN ⇒ all " +
       "127, Inf ⇒ itself 127 / finites 0") {
    // Spark SQL can't express this (its `floor` returns LONG, casting
    // NaN to 0) — the native kernel matches the ORACLE's double-typed
    // list_max/floor/least/greatest chain instead
    val df = spark.range(1).select(
      typedlit(Seq(0.5, Double.NaN, -1.0)).as("withNan"),
      typedlit(Seq(0.5, Double.PositiveInfinity, -1.0)).as("withInf"))
    val row = df.select(
      transform(Native.quantizeI8(col("withNan")),
        b => b.cast("double")).as("qn"),
      transform(Native.quantizeI8(col("withInf")),
        b => b.cast("double")).as("qi")).head()
    assert(row.getSeq[Double](0) == Seq(127.0, 127.0, 127.0))
    assert(row.getSeq[Double](1) == Seq(0.0, 127.0, 0.0))
  }

  test("zero vector quantizes to all zeros; null stays null") {
    val df = spark.range(1).select(
      typedlit(Array.fill(4)(0.0)).as("z"),
      lit(null).cast("array<double>").as("n"))
    val row = df.select(
      Native.quantizeI8(col("z")).as("qz"),
      Native.quantizeI8(col("n")).as("qn")).head()
    assert(row.getSeq[Byte](0) == Seq[Byte](0, 0, 0, 0))
    assert(row.isNullAt(1))
  }

  test("SQL registration: graft_quantize_i8 / graft_dot_i8 resolve") {
    Native.install(spark)
    vecs.limit(5).createOrReplaceTempView("quant_vecs")
    val n = spark.sql(
      """SELECT graft_dot_i8(graft_quantize_i8(embedding),
        |                    graft_quantize_i8(embedding)) AS d
        |FROM quant_vecs""".stripMargin)
      .filter(col("d") > 0).count()
    assert(n == 5)
  }
}
