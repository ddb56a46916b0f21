package graft.ops

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column inventory (north-star M6): opaque binary payloads
  * with typed metadata. Two REAL in-JDK codecs run through the
  * partition-batched seam (`mm_decode_real`: PNG/BMP; `mm_decode_jpeg`:
  * baseline JPEG — the dominant web-corpus format); the remaining
  * decode steps are clearly-marked deterministic stubs
  * ([[Multimodal.decodeStub]] — no other media libs in the container).
  * The Spark plumbing (binary schema, partition-batched decode,
  * frame-sampling explode) is real and oracle-verified throughout.
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

    // BINARY CONTENT DEDUP — the media-side exact dedup every crawl
    // pipeline runs before any decode: group by content digest (md5
    // over the raw BYTES), surface duplicate groups with the min-id
    // representative. One uniform digest-keyed shuffle of (16-byte
    // digest, id) pairs — payload bytes never cross the network
    // (digest computed at the scan). Planted copies make real groups;
    // the oracle hashes the same UTF-8 bytes via md5(text).
    Q("mm_dedup_binary",
      (s, d) => Multimodal
        .asBinary(TextQueries.plantedDocs(s, d))
        .groupBy(md5(col("bytes")).as("digest"))
        .agg(count(lit(1)).as("n_copies"),
          min(col("doc_id")).as("keep_id"))
        .filter(col("n_copies") > 1)
        .orderBy(col("digest")),
      Some("""WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' qq17' FROM documents
        |  WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS digest, count(*) AS n_copies,
        |       min(doc_id) AS keep_id
        |FROM docs GROUP BY 1 HAVING count(*) > 1
        |ORDER BY digest""".stripMargin)),

    // REAL codec through the same partition-batched seam (r8 verdict
    // item 6): deterministic real PNG bytes are encoded and FULLY
    // decoded with the in-JDK ImageIO codec — no new deps, stub
    // queries unchanged. px_sum is the checksum of every decoded
    // raster sample, so a hash-match proves actual pixel
    // decompression; the oracle recomputes dims and the checksum from
    // the id arithmetic the fixture pins.
    Q("mm_decode_real",
      (s, d) => Multimodal
        .decodeRealRoundtrip(Tables.documents(s, d))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 2 AS w, doc_id % 18 + 2 AS h
        |  FROM documents),
        | px AS (
        |  SELECT doc_id, w, h,
        |         sum(3 * ((doc_id + 3 * x.x + 7 * y.y) % 256)) AS s
        |  FROM d, generate_series(0, 24) x(x), generate_series(0, 18) y(y)
        |  WHERE x.x < w AND y.y < h GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |       CAST(h AS INTEGER) AS height,
        |       3 AS channels, 'png' AS format,
        |       CAST(s AS BIGINT) AS px_sum
        |FROM px ORDER BY doc_id""".stripMargin)),

    // REAL JPEG decode — the format a 100 TB web corpus is actually
    // made of (r9 verdict item 1). The fixture is the one family a
    // lossy codec reproduces bit-exactly: block-constant grayscale at
    // compression quality 1.0 (every 8×8 JPEG block is DC-only and the
    // DC coefficient survives quantization exactly — empirically pinned
    // across all 600 id shapes and all 256 sample values). The bytes
    // are genuinely JPEG-compressed (FFD8 magic, entropy-coded DCT,
    // sniffed and fully decoded by the in-JDK ImageIO JPEG reader);
    // px_sum checksums every decoded raster sample, so a hash match
    // proves actual pixel decompression, and the oracle recomputes
    // dims + checksum from the id arithmetic the fixture pins.
    Q("mm_decode_jpeg",
      (s, d) => Multimodal
        .decodeRealRoundtrip(Tables.documents(s, d),
          encoder = Multimodal.encodeJpeg)
        .toDF()
        .orderBy(col("doc_id")),
      Some("""WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 2 AS w, doc_id % 18 + 2 AS h
        |  FROM documents),
        | px AS (
        |  SELECT doc_id, w, h,
        |         sum((doc_id + 5 * (x.x // 8) + 11 * (y.y // 8)) % 256)
        |           AS s
        |  FROM d, generate_series(0, 24) x(x), generate_series(0, 18) y(y)
        |  WHERE x.x < w AND y.y < h GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |       CAST(h AS INTEGER) AS height,
        |       1 AS channels, 'jpeg' AS format,
        |       CAST(s AS BIGINT) AS px_sum
        |FROM px ORDER BY doc_id""".stripMargin)),

    // Frame sampling: every 7th frame of a payload-derived clip length.
    Q("mm_frame_sample",
      (s, d) => Multimodal
        .sampleFrames(Multimodal.asBinary(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""SELECT doc_id,
        |  unnest(generate_series(0, octet_length(encode(text)) % 100 + 9, 7))
        |    AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin)),

    // Partition-batched feature extraction (stubbed encoder, real
    // batching/schema): deterministic pseudo-features from exact integer
    // arithmetic so the oracle reproduces the doubles bitwise.
    Q("mm_feature_extract",
      (s, d) => Multimodal
        .extractFeatures(Multimodal.asBinary(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS DOUBLE) AS f0,
        |  CAST(octet_length(encode(text)) * 2654435761 % 1048576 AS DOUBLE)
        |    / 1048576 AS f1,
        |  CAST(doc_id * 40503 % 65536 AS DOUBLE) / 65536 AS f2,
        |  CAST((octet_length(encode(text)) + doc_id) % 997 AS DOUBLE)
        |    / 997 AS f3
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Aspect-preserving resize plan over decoded metadata: integer
    // column math (never upscale, fit 256²).
    Q("mm_resize",
      (s, d) => Multimodal.resizePlan(
          Multimodal.decodeMeta(
            Multimodal.asBinary(Tables.documents(s, d))).toDF())
        .orderBy(col("doc_id")),
      Some("""WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |    CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(CASE WHEN greatest(width, height) > 256
        |    THEN width * 256 // greatest(width, height)
        |    ELSE width END AS INTEGER) AS out_w,
        |  CAST(CASE WHEN greatest(width, height) > 256
        |    THEN height * 256 // greatest(width, height)
        |    ELSE height END AS INTEGER) AS out_h
        |FROM m ORDER BY doc_id""".stripMargin)),

    // Partition-batched embedding inference (stubbed encoder, real
    // batching/schema — output feeds Similarity unchanged). The stub's
    // components are exact dyadic rationals (k/1024), so float, double,
    // and the DuckDB list comprehension agree bitwise; the projection
    // checks two raw components and the exact-in-double squared norm.
    Q("mm_batch_embed",
      (s, d) => {
        val emb = Multimodal
          .batchEmbed(Multimodal.asBinary(Tables.documents(s, d)))
        emb.select(col("doc_id"),
          element_at(col("embedding"), 1).cast("double").as("e0"),
          element_at(col("embedding"), 18).cast("double").as("e17"),
          org.apache.spark.sql.graft.Native.dot(
            transform(col("embedding"), x => x.cast("double")),
            transform(col("embedding"), x => x.cast("double")))
            .as("sq_norm"),
          size(col("embedding")).as("dim"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH e AS (
        |  SELECT doc_id,
        |    [CAST(((doc_id * 2654435761 + j * 40503
        |            + octet_length(encode(text)) * 97) % 2048 - 1024)
        |          AS DOUBLE) / 1024.0
        |     FOR j IN generate_series(0, 63)] AS emb
        |  FROM documents)
        |SELECT doc_id, emb[1] AS e0, emb[18] AS e17,
        |  list_dot_product(emb, emb) AS sq_norm,
        |  len(emb) AS dim
        |FROM e ORDER BY doc_id""".stripMargin))
  )
}
