package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class PackingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("every bin fits the capacity unless it is a single oversized doc") {
    val packed = Packing.packSequences(docs, capacity = 256)
    val bins = packed.groupBy("group", "seq_id")
      .agg(sum("n_tok").as("fill"), count(lit(1)).as("n_docs"))
    val bad = bins.filter(col("fill") > 256 && col("n_docs") > 1)
    assert(bad.isEmpty, "a multi-doc bin exceeds capacity")
    assert(bins.count() > docs.count() / 64, "suspiciously few bins")
  }

  test("packing is invariant to input partitioning") {
    val a = Packing.packSequences(docs, 256).collect().toSet
    val b = Packing.packSequences(docs.repartition(13), 256)
      .collect().toSet
    assert(a == b)
  }

  test("sharded packing covers every doc with valid bins") {
    val packed = Packing.packSequences(docs, 256, shards = 4)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    val bad = packed.groupBy("group", "seq_id")
      .agg(sum("n_tok").as("fill"), count(lit(1)).as("n"))
      .filter(col("fill") > 256 && col("n") > 1)
    assert(bad.isEmpty)
  }

  test("null text packs as an empty doc; null id rows are dropped") {
    import spark.implicits._
    val dirty = Seq(
      ("en", Some(1L), Option("a b c")),
      ("en", Some(2L), None),
      ("en", None, Option("x y"))
    ).toDF("lang", "doc_id", "text")
    val packed = Packing.packSequences(dirty, capacity = 10)
      .orderBy("doc_id").collect()
    assert(packed.length == 2)
    assert(packed.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(packed(1).getLong(2) == 0L, "null text should count 0 tokens")
  }

  test("an oversized doc gets a bin of its own") {
    import spark.implicits._
    val tiny = Seq(
      ("en", 1L, "a b c"),
      ("en", 2L, (1 to 50).map(_ => "w").mkString(" ")),
      ("en", 3L, "d e")).toDF("lang", "doc_id", "text")
    val packed = Packing.packSequences(tiny, capacity = 10)
      .orderBy("doc_id").collect()
    assert(packed.map(_.getLong(3)).toSeq == Seq(0L, 1L, 2L),
      packed.mkString(","))
  }
}
