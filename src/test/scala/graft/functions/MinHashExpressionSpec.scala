package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec
import graft.sources.Tables
import graft.text.Dedup

/** graft_minhash: the codegen'd per-row kernel must produce signatures
  * bit-identical to the explode + min-aggregate formulation (the kernel
  * replicates Spark's `xxhash64(h, i)` chain exactly).
  */
class MinHashExpressionSpec extends SparkSpec {

  test("native kernel equals the aggregation formulation, every doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val native = Dedup.minHashSignatures(docs, numHashes = 16, k = 3)
    val agg = Dedup.minHashSignaturesAgg(docs, numHashes = 16, k = 3)
    val diff = native.as("n")
      .join(agg.as("a"), col("n.doc_id") === col("a.doc_id"))
      .filter(to_json(col("n.sig")) =!= to_json(col("a.sig")))
    assert(diff.isEmpty, "signatures diverge")
    assert(native.count() === agg.count())
  }

  test("graft_minhash registered as a SQL function, fixed width") {
    Native.install(spark)
    val sizes = spark.sql(
      "SELECT size(graft_minhash(array(1L, 2L, 3L), 8)) s").head().getInt(0)
    assert(sizes === 8)
  }
}
