package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.sources.Tables
import graft.text.Dedup

/** graft_simhash: the codegen'd per-row kernel must be bit-identical to
  * the explode + 64-sign-sum aggregation it replaced.
  */
class SimHashExpressionSpec extends SparkSpec {

  test("native kernel equals the aggregation formulation, every doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val native = Dedup.simHash(docs)
    val agg = Dedup.simHashAggFormulation(docs)
    val diff = native.as("n")
      .join(agg.as("a"), col("n.doc_id") === col("a.doc_id"))
      .filter(col("n.simhash") =!= col("a.simhash"))
    assert(diff.isEmpty, "digests diverge")
    assert(native.count() === docs.count())
  }

  test("empty token array hashes to all-zero digest (no positive sums)") {
    import spark.implicits._
    val got = Seq(Array.empty[String]).toDF("toks")
      .select(Native.simhash(col("toks"))).head().getLong(0)
    assert(got === 0L)
  }

  test("graft_simhash registered as a SQL function") {
    Native.install(spark)
    val h = spark.sql("SELECT graft_simhash(array('a','b','c')) h")
      .head().getLong(0)
    val h2 = spark.sql("SELECT graft_simhash(array('a','b','c')) h")
      .head().getLong(0)
    assert(h === h2)
  }
}
