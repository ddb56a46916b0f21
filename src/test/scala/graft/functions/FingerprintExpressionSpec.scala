package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.sources.Tables
import graft.text.TextAnalysis

/** graft_min_shingle_md5: the codegen'd kernel must produce exactly the
  * same fingerprint as the HOF formulation it replaced
  * (`array_min(transform(shingles, s -> md5(s)))`) on every document.
  */
class FingerprintExpressionSpec extends SparkSpec {

  test("native kernel equals the HOF formulation on every doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val toks = split(col("text"), " ")
    val both = docs.select(
      col("doc_id"),
      Native.minShingleMd5(toks).as("native_fp"),
      TextAnalysis.minShingleMd5Hof(toks).as("hof_fp"))
    val diff = both.filter(
      col("native_fp") =!= col("hof_fp") ||
        col("native_fp").isNull =!= col("hof_fp").isNull)
    assert(diff.isEmpty, "fingerprints diverge")
    assert(both.filter(col("native_fp").isNotNull).count() > 0)
  }

  test("null tokens follow concat_ws skip semantics exactly") {
    // regression: the kernel emitted the separator for skipped null
    // tokens ("a  b"), diverging from concat_ws ("a b")
    import spark.implicits._
    val withNulls = Seq(1).toDF("x")
      .select(array(lit("a"), lit(null).cast("string"), lit("b"),
        lit("c"), lit("d")).as("toks"))
    val both = withNulls.select(
      Native.minShingleMd5(col("toks")).as("native_fp"),
      TextAnalysis.minShingleMd5Hof(col("toks")).as("hof_fp"))
      .head()
    assert(both.getString(0) === both.getString(1))
  }

  test("fewer than 3 tokens yields null") {
    import spark.implicits._
    val r = Seq("a b", "only one", "x y z").toDF("text")
      .select(Native.minShingleMd5(split(col("text"), " ")).as("fp"))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).isNullAt(0))
    assert(!r(2).isNullAt(0))
  }
}
