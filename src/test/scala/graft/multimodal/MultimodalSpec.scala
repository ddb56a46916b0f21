package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asBinary(Tables.documents(spark, sf))

  test("decode output is independent of partitioning and batch size") {
    val a = Multimodal.decodeMeta(media, batchSize = 64).toDF()
    val b = Multimodal.decodeMeta(media.repartition(7), batchSize = 1).toDF()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.count() === media.count())
  }

  test("decoded metadata is a deterministic function of the payload") {
    val m = Multimodal.decodeMeta(media).toDF()
    val bad = m.filter(
      col("width") =!= col("n_bytes") % 640 ||
      col("height") =!= (col("n_bytes") * 7) % 480 ||
      col("width") < 0 || col("height") < 0)
    assert(bad.isEmpty)
    val formats = m.select("format").distinct()
      .collect().map(_.getString(0)).toSet
    assert(formats.subsetOf(Set("jpeg", "png", "webp")))
  }

  test("frame sampling yields ceil(n_frames/step) indices per doc") {
    val frames = Multimodal.sampleFrames(media, step = 7)
    val counts = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val expected = media
      .select(col("doc_id"),
        (length(col("bytes")).cast("long") % 100L + 10L).as("nf"))
      .select(col("doc_id"),
        (expr("(nf - 1) div 7") + 1L).as("n_expected"))
    val joined = counts.join(expected, Seq("doc_id"))
    assert(joined.filter(col("n") =!= col("n_expected")).isEmpty)
  }

  test("batchEmbed: partition/batch-invariant and feeds the ANN stack") {
    val a = Multimodal.batchEmbed(media, batchSize = 64)
    val b = Multimodal.batchEmbed(media.repartition(5), batchSize = 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.count() === media.count())

    // output schema is the embeddings-table contract: ANN runs on it
    val vecs = a.select(col("doc_id").as("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    val top = graft.sim.Similarity.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") < 3), k = 2)
    assert(top.groupBy("query_id").count()
      .filter(col("count") =!= 2).isEmpty)
  }
}
