package graft.ops

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column inventory (north-star M6): opaque binary payloads
  * with typed metadata. The decode step is a clearly-marked
  * deterministic stub ([[Multimodal.decodeStub]] — no media libs in the
  * container); the Spark plumbing (binary schema, partition-batched
  * decode, frame-sampling explode) is real and oracle-verified.
  */
object MultimodalQueries extends QueryPack {

  def queries: Seq[Q] = Seq(

    // Partition-batched metadata decode over the binary payload.
    Q("mm_decode_meta",
      (s, d) => Multimodal
        .decodeMeta(Multimodal.asBinary(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |  CASE octet_length(encode(text)) % 3
        |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        |  octet_length(encode(text)) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling: every 7th frame of a payload-derived clip length.
    Q("mm_frame_sample",
      (s, d) => Multimodal
        .sampleFrames(Multimodal.asBinary(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""SELECT doc_id,
        |  unnest(generate_series(0, octet_length(encode(text)) % 100 + 9, 7))
        |    AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
