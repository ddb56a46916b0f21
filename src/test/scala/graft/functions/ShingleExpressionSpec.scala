package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.sources.Tables
import graft.text.Dedup

/** graft_shingles: the codegen'd kernel must produce the same DISTINCT
  * shingle-hash SET per document as the HOF formulation it replaced
  * (kernel output is sorted; compare as sets).
  */
class ShingleExpressionSpec extends SparkSpec {

  test("native kernel equals the HOF formulation as a set, every doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val native = docs
      .select(col("doc_id"),
        Native.shingles(split(col("text"), " "), 3).as("sharr"))
      .filter(size(col("sharr")) > 0)
      .select(col("doc_id"), sort_array(col("sharr")).as("s"))
    val hof = Dedup.shingleArrayHof(docs, 3)
      .select(col("doc_id"), sort_array(col("sharr")).as("s"))
    val diff = native.as("n")
      .join(hof.as("h"), col("n.doc_id") === col("h.doc_id"))
      .filter(to_json(col("n.s")) =!= to_json(col("h.s")))
    assert(diff.isEmpty, "shingle sets diverge")
    assert(native.count() === hof.count())
  }

  test("fewer than k tokens yields an empty array") {
    Native.install(spark)
    val n = spark.sql("SELECT size(graft_shingles(array('a','b'), 3)) s")
      .head().getInt(0)
    assert(n === 0)
  }
}
