package graft.ops

import org.apache.spark.sql.functions._

import graft.multimodal.{AudioCodec, Multimodal, VideoCodec}
import graft.sources.Tables

/** Multimodal-column inventory (north-star M6): opaque binary payloads
  * with typed metadata. Every modality now has a REAL in-JDK codec
  * proof through the partition-batched seam — image lossless
  * (`mm_decode_real`: PNG/BMP), image lossy (`mm_decode_jpeg`:
  * baseline JPEG, the dominant web-corpus format), audio
  * (`mm_decode_wav`: RIFF/WAVE 16-bit PCM via javax.sound.sampled),
  * and video (`mm_decode_avi` / `mm_video_framesum`: MJPEG-in-AVI —
  * a real RIFF demuxer + per-frame ImageIO JPEG decode). As of r12
  * the feature/embed steps do REAL pixel math over the decoded
  * rasters too ([[Multimodal.convFeatures]] /
  * [[Multimodal.embedPooled]] — hand-rolled conv kernels and a
  * pool→dense head with fixed integer weights, the
  * [[graft.ml.LinearClassifier]] pattern; no ML runtime in the
  * container, none needed). Only the toy metadata decode
  * ([[Multimodal.decodeStub]], `mm_decode_meta`/`mm_frame_sample`/
  * `mm_resize`) remains a deterministic payload-arithmetic fixture —
  * kept as the schema/batching contract the real codecs plug into.
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

    // REAL AUDIO decode (r11: audio was the last stubbed modality with
    // no real-codec proof). Deterministic 16-bit PCM WAV bytes — built
    // AND parsed by the in-JDK javax.sound.sampled codec — flow through
    // the same partition-batched seam as the image paths. PCM is
    // lossless, so smp_sum (checksum of EVERY decoded sample) and
    // zero_cross (per-channel sign-change count — a real DSP feature
    // computed from the decoded samples) are pure integer functions of
    // the id the oracle reproduces; a hash match proves the codec
    // actually unpacked the RIFF/fmt/data chunks and the LE16 frames.
    Q("mm_decode_wav",
      (s, d) => AudioCodec
        .decodeWavRoundtrip(Tables.documents(s, d))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |    doc_id % 120 + 30 AS n_frames
        |  FROM documents),
        | s AS (
        |  SELECT doc_id, channels, sample_rate, n_frames,
        |    sum((doc_id * 31 + i.i * 17 + c.c * 7919) % 65536 - 32768)
        |      AS smp,
        |    sum(CASE WHEN i.i >= 1 AND
        |          ((doc_id * 31 + i.i * 17 + c.c * 7919) % 65536 < 32768)
        |          <> ((doc_id * 31 + (i.i - 1) * 17 + c.c * 7919) % 65536
        |              < 32768)
        |        THEN 1 ELSE 0 END) AS zc
        |  FROM d, generate_series(0, 149) i(i), generate_series(0, 1) c(c)
        |  WHERE i.i < n_frames AND c.c < channels
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, sample_rate, channels,
        |       CAST(n_frames AS BIGINT) AS n_frames, 'wav' AS format,
        |       CAST(smp AS BIGINT) AS smp_sum,
        |       CAST(zc AS BIGINT) AS zero_cross
        |FROM s ORDER BY doc_id""".stripMargin)),

    // REAL VIDEO decode (r11): MJPEG frames in a spec-complete AVI
    // container — a real RIFF demuxer (hdrl→avih metadata, movi→##dc
    // frames) plus a full ImageIO JPEG decode of EVERY frame. The
    // frames are the block-constant family mm_decode_jpeg proved
    // bit-exact at quality 1.0, extended with a per-frame term, so the
    // all-frames raster checksum is id arithmetic the oracle recomputes
    // block-wise (block value × clipped block area — no per-pixel
    // enumeration, the oracle stays cheap at replica scale).
    Q("mm_decode_avi",
      (s, d) => VideoCodec
        .decodeAviRoundtrip(Tables.documents(s, d))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""WITH d AS (
        |  SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 12 + 8 AS h,
        |         doc_id % 5 + 2 AS nf
        |  FROM documents),
        | px AS (
        |  SELECT doc_id, w, h, nf,
        |    sum(((doc_id + 13 * f.f + 5 * bx.bx + 11 * bb.bb) % 256)
        |        * least(8, w - 8 * bx.bx) * least(8, h - 8 * bb.bb)) AS s
        |  FROM d, generate_series(0, 5) f(f), generate_series(0, 2) bx(bx),
        |       generate_series(0, 2) bb(bb)
        |  WHERE f.f < nf AND 8 * bx.bx < w AND 8 * bb.bb < h
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(w AS INTEGER) AS width,
        |       CAST(h AS INTEGER) AS height,
        |       CAST(nf AS BIGINT) AS n_frames,
        |       CAST(CASE doc_id % 4 WHEN 0 THEN 10 WHEN 1 THEN 16
        |            WHEN 2 THEN 20 ELSE 25 END AS INTEGER) AS fps,
        |       'mjpeg' AS format, CAST(s AS BIGINT) AS px_sum
        |FROM px ORDER BY doc_id""".stripMargin)),

    // Frame sampling on REAL video: demux, entropy-decode ONLY every
    // 2nd frame (skipped frames never hit the JPEG decoder — the cost
    // model frame sampling exists for), one row per sampled frame with
    // its full raster checksum. The real-bytes counterpart of the
    // mm_frame_sample stub explode.
    Q("mm_video_framesum",
      (s, d) => VideoCodec
        .frameSampleRoundtrip(Tables.documents(s, d), step = 2)
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH d AS (
        |  SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 12 + 8 AS h,
        |         doc_id % 5 + 2 AS nf
        |  FROM documents),
        | fr AS (
        |  SELECT doc_id, f.f AS frame_idx,
        |    sum(((doc_id + 13 * f.f + 5 * bx.bx + 11 * bb.bb) % 256)
        |        * least(8, w - 8 * bx.bx) * least(8, h - 8 * bb.bb)) AS fs
        |  FROM d, generate_series(0, 5) f(f), generate_series(0, 2) bx(bx),
        |       generate_series(0, 2) bb(bb)
        |  WHERE f.f < nf AND f.f % 2 = 0 AND 8 * bx.bx < w
        |    AND 8 * bb.bb < h
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |       CAST(fs AS BIGINT) AS f_sum
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin)),

    // THE MEDIA CORPUS BUILD (r11) — the multimodal counterpart of
    // pipeline_full_build: the separately-proven real-codec stages
    // COMPOSED into one oracled curation query. One partition-batched
    // pass computes content digest + REAL decode per payload (bytes
    // touched once, never shuffled); the corrupt-media gate drops the
    // planted truncations (every 97th id — a PNG signature with a
    // truncated IHDR); exact binary dedup keeps the min-id survivor
    // per digest (the PNG fixture family makes duplicate classes
    // provably = id % 2304: dims repeat mod 24/18, the raster mod
    // 256, and the encoder is deterministic — pinned byte-level in
    // MultimodalSpec); the survivor rollup aggregates REAL decoded
    // pixel statistics per height class. Only digest-keyed metadata
    // rows reach the one dedup shuffle; the rollup is map-side
    // partial. The oracle replays gate → class-dedup → rollup from
    // the id arithmetic.
    Q("pipeline_media_build",
      (s, d) => {
        val scan = Multimodal.scanMedia(Tables.documents(s, d)).toDF()
        val keep = scan
          .filter(col("format") =!= "undecodable")
          .groupBy(col("digest"))
          .agg(min(col("doc_id")).as("keep_id"),
            min(col("width")).as("width"),
            min(col("height")).as("height"),
            min(col("px_sum")).as("px_sum"))
        keep.groupBy(col("height"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("px_sum")).as("total_px"),
            sum(lit(3L) * col("width") * col("height"))
              .as("total_samples"))
          .orderBy(col("height"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 2 AS w, doc_id % 18 + 2 AS h
        |  FROM documents WHERE doc_id % 97 <> 0),
        | px AS (
        |  SELECT doc_id, w, h,
        |         sum(3 * ((doc_id + 3 * x.x + 7 * y.y) % 256)) AS s
        |  FROM d, generate_series(0, 24) x(x), generate_series(0, 18) y(y)
        |  WHERE x.x < w AND y.y < h GROUP BY 1, 2, 3),
        | keep AS (
        |  SELECT min(w) AS w, min(h) AS h, min(s) AS s
        |  FROM px GROUP BY doc_id % 2304)
        |SELECT CAST(h AS INTEGER) AS height, count(*) AS n_docs,
        |       CAST(sum(s) AS BIGINT) AS total_px,
        |       CAST(sum(3 * w * h) AS BIGINT) AS total_samples
        |FROM keep GROUP BY h ORDER BY height""".stripMargin)),

    // Frame sampling: every 7th frame of a payload-derived clip length.
    Q("mm_frame_sample",
      (s, d) => Multimodal
        .sampleFrames(Multimodal.asBinary(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""SELECT doc_id,
        |  unnest(generate_series(0, octet_length(encode(text)) % 100 + 9, 7))
        |    AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin)),

    // REAL feature extraction (r12 — formerly an id-arithmetic stub):
    // fixed-integer Sobel-x/Sobel-y/Laplacian/box convolutions over
    // the ACTUALLY DECODED PNG raster, through the same
    // partition-batched seam as mm_decode_real. The fixture's pixels
    // are analytic ((id+3x+7y)%256), so the oracle re-derives every
    // edge-energy sum with pure integer SQL — a hash match proves the
    // conv consumed real decompressed pixels, not header metadata.
    // Images with an empty 3×3 interior (w or h = 2) yield zeros via
    // the LEFT JOIN.
    Q("mm_feature_extract",
      (s, d) => Multimodal
        .extractFeatures(Tables.documents(s, d))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 2 AS w, doc_id % 18 + 2 AS h
        |  FROM documents),
        | g AS (
        |  SELECT doc_id,
        |    abs(((doc_id + 3*(x.x+1) + 7*(y.y-1)) % 256)
        |      + 2*((doc_id + 3*(x.x+1) + 7*y.y) % 256)
        |      + ((doc_id + 3*(x.x+1) + 7*(y.y+1)) % 256)
        |      - ((doc_id + 3*(x.x-1) + 7*(y.y-1)) % 256)
        |      - 2*((doc_id + 3*(x.x-1) + 7*y.y) % 256)
        |      - ((doc_id + 3*(x.x-1) + 7*(y.y+1)) % 256)) AS sx,
        |    abs(((doc_id + 3*(x.x-1) + 7*(y.y+1)) % 256)
        |      + 2*((doc_id + 3*x.x + 7*(y.y+1)) % 256)
        |      + ((doc_id + 3*(x.x+1) + 7*(y.y+1)) % 256)
        |      - ((doc_id + 3*(x.x-1) + 7*(y.y-1)) % 256)
        |      - 2*((doc_id + 3*x.x + 7*(y.y-1)) % 256)
        |      - ((doc_id + 3*(x.x+1) + 7*(y.y-1)) % 256)) AS sy,
        |    abs(((doc_id + 3*(x.x+1) + 7*y.y) % 256)
        |      + ((doc_id + 3*(x.x-1) + 7*y.y) % 256)
        |      + ((doc_id + 3*x.x + 7*(y.y+1)) % 256)
        |      + ((doc_id + 3*x.x + 7*(y.y-1)) % 256)
        |      - 4*((doc_id + 3*x.x + 7*y.y) % 256)) AS lp,
        |    ((doc_id + 3*(x.x-1) + 7*(y.y-1)) % 256)
        |      + ((doc_id + 3*x.x + 7*(y.y-1)) % 256)
        |      + ((doc_id + 3*(x.x+1) + 7*(y.y-1)) % 256)
        |      + ((doc_id + 3*(x.x-1) + 7*y.y) % 256)
        |      + ((doc_id + 3*x.x + 7*y.y) % 256)
        |      + ((doc_id + 3*(x.x+1) + 7*y.y) % 256)
        |      + ((doc_id + 3*(x.x-1) + 7*(y.y+1)) % 256)
        |      + ((doc_id + 3*x.x + 7*(y.y+1)) % 256)
        |      + ((doc_id + 3*(x.x+1) + 7*(y.y+1)) % 256) AS bx
        |  FROM d, generate_series(1, 23) x(x), generate_series(1, 17) y(y)
        |  WHERE x.x <= w - 2 AND y.y <= h - 2),
        | a AS (
        |  SELECT doc_id, sum(sx) AS f0, sum(sy) AS f1,
        |         sum(lp) AS f2, sum(bx) AS f3
        |  FROM g GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(f0, 0) AS DOUBLE) AS f0,
        |  CAST(coalesce(f1, 0) AS DOUBLE) AS f1,
        |  CAST(coalesce(f2, 0) AS DOUBLE) AS f2,
        |  CAST(coalesce(f3, 0) AS DOUBLE) AS f3
        |FROM d LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

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

    // REAL embedding inference (r12 — formerly an id-arithmetic stub):
    // adaptive 8×8 grid pool over the ACTUALLY DECODED PNG raster +
    // fixed-integer-weight linear head (Multimodal.embedPooled — the
    // LinearClassifier fixed-weight pattern). Components are exact
    // dyadic rationals (integer/1024 with the numerator < 2²⁴), so
    // float, double, and DuckDB integer SQL agree bitwise. The
    // projection checks three raw components and the exact component
    // sum — Σⱼ W(j,c) telescopes to ((3c) mod 7) − 3, plus 1 for the
    // residual term (each cell is its own j exactly once at dim 64),
    // so the oracle verifies ALL 64 weights' mass in one cell-sized
    // pass (never a 64× blowup of the pixel table). Output schema is the
    // embeddings-table contract; the vectors feed Similarity unchanged.
    Q("mm_batch_embed",
      (s, d) => {
        val emb = Multimodal.batchEmbed(Tables.documents(s, d))
        emb.select(col("doc_id"),
          element_at(col("embedding"), 1).cast("double").as("e0"),
          element_at(col("embedding"), 18).cast("double").as("e17"),
          element_at(col("embedding"), 64).cast("double").as("e63"),
          expr("aggregate(transform(embedding, x -> cast(x as double))," +
            " cast(0.0 as double), (a, v) -> a + v)").as("comp_sum"),
          size(col("embedding")).as("dim"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 2 AS w, doc_id % 18 + 2 AS h
        |  FROM documents),
        | p AS (
        |  SELECT doc_id, ((x.x * 8) // w) * 8 + ((y.y * 8) // h) AS cell,
        |         sum((doc_id + 3 * x.x + 7 * y.y) % 256) AS p
        |  FROM d, generate_series(0, 24) x(x), generate_series(0, 18) y(y)
        |  WHERE x.x < w AND y.y < h GROUP BY 1, 2),
        | e AS (
        |  SELECT doc_id,
        |    sum((((31 * 0 + 17 * cell + 7) % 7) - 3) * p
        |        + CASE WHEN cell = 0 THEN p ELSE 0 END) AS n0,
        |    sum((((31 * 17 + 17 * cell + 7) % 7) - 3) * p
        |        + CASE WHEN cell = 17 THEN p ELSE 0 END) AS n17,
        |    sum((((31 * 63 + 17 * cell + 7) % 7) - 3) * p
        |        + CASE WHEN cell = 63 THEN p ELSE 0 END) AS n63,
        |    sum((((3 * cell) % 7) - 2) * p) AS nsum
        |  FROM p GROUP BY 1)
        |SELECT doc_id,
        |  CAST(n0 AS DOUBLE) / 1024 AS e0,
        |  CAST(n17 AS DOUBLE) / 1024 AS e17,
        |  CAST(n63 AS DOUBLE) / 1024 AS e63,
        |  CAST(nsum AS DOUBLE) / 1024 AS comp_sum,
        |  64 AS dim
        |FROM e ORDER BY doc_id""".stripMargin)),

    // MULTI-BAND conv features (r13, VERDICT r12 item 6): same kernels
    // as mm_feature_extract but over the RGB fixture family, whose
    // three bands are DISTINCT phase-shifted ramps — the kernels read
    // the integer luma (77R+150G+29B)>>8 of every pixel, so a
    // band-0-only (or band-order-confused) implementation
    // hash-mismatches. The oracle re-derives the luma per neighbor
    // with pure integer SQL (rendered by [[lumaSql]]).
    Q("mm_feature_extract_rgb",
      (s, d) => Multimodal
        .extractFeatures(Tables.documents(s, d),
          encoder = Multimodal.encodePngRgb)
        .toDF()
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 2 AS w, doc_id % 18 + 2 AS h
        |  FROM documents),
        | g AS (
        |  SELECT doc_id,
        |    abs(${lumaSql(1, -1)} + 2*${lumaSql(1, 0)} + ${lumaSql(1, 1)}
        |      - ${lumaSql(-1, -1)} - 2*${lumaSql(-1, 0)} - ${lumaSql(-1, 1)}) AS sx,
        |    abs(${lumaSql(-1, 1)} + 2*${lumaSql(0, 1)} + ${lumaSql(1, 1)}
        |      - ${lumaSql(-1, -1)} - 2*${lumaSql(0, -1)} - ${lumaSql(1, -1)}) AS sy,
        |    abs(${lumaSql(1, 0)} + ${lumaSql(-1, 0)} + ${lumaSql(0, 1)}
        |      + ${lumaSql(0, -1)} - 4*${lumaSql(0, 0)}) AS lp,
        |    ${lumaSql(-1, -1)} + ${lumaSql(0, -1)} + ${lumaSql(1, -1)}
        |      + ${lumaSql(-1, 0)} + ${lumaSql(0, 0)} + ${lumaSql(1, 0)}
        |      + ${lumaSql(-1, 1)} + ${lumaSql(0, 1)} + ${lumaSql(1, 1)} AS bx
        |  FROM d, generate_series(1, 23) x(x), generate_series(1, 17) y(y)
        |  WHERE x.x <= w - 2 AND y.y <= h - 2),
        | a AS (
        |  SELECT doc_id, sum(sx) AS f0, sum(sy) AS f1,
        |         sum(lp) AS f2, sum(bx) AS f3
        |  FROM g GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(f0, 0) AS DOUBLE) AS f0,
        |  CAST(coalesce(f1, 0) AS DOUBLE) AS f1,
        |  CAST(coalesce(f2, 0) AS DOUBLE) AS f2,
        |  CAST(coalesce(f3, 0) AS DOUBLE) AS f3
        |FROM d LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // MULTI-BAND pooled embedding (r13): mm_batch_embed's pool→dense
    // head over the RGB fixture — the pool accumulates the luma of
    // every pixel, so all three decoded bands are load-bearing in the
    // hash. Exactness bound unchanged (luma ≤ 255).
    Q("mm_batch_embed_rgb",
      (s, d) => {
        val emb = Multimodal.batchEmbed(Tables.documents(s, d),
          encoder = Multimodal.encodePngRgb)
        emb.select(col("doc_id"),
          element_at(col("embedding"), 1).cast("double").as("e0"),
          element_at(col("embedding"), 18).cast("double").as("e17"),
          element_at(col("embedding"), 64).cast("double").as("e63"),
          expr("aggregate(transform(embedding, x -> cast(x as double))," +
            " cast(0.0 as double), (a, v) -> a + v)").as("comp_sum"),
          size(col("embedding")).as("dim"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (
        |  SELECT doc_id, doc_id % 24 + 2 AS w, doc_id % 18 + 2 AS h
        |  FROM documents),
        | p AS (
        |  SELECT doc_id, ((x.x * 8) // w) * 8 + ((y.y * 8) // h) AS cell,
        |         sum(${lumaSql(0, 0)}) AS p
        |  FROM d, generate_series(0, 24) x(x), generate_series(0, 18) y(y)
        |  WHERE x.x < w AND y.y < h GROUP BY 1, 2),
        | e AS (
        |  SELECT doc_id,
        |    sum((((31 * 0 + 17 * cell + 7) % 7) - 3) * p
        |        + CASE WHEN cell = 0 THEN p ELSE 0 END) AS n0,
        |    sum((((31 * 17 + 17 * cell + 7) % 7) - 3) * p
        |        + CASE WHEN cell = 17 THEN p ELSE 0 END) AS n17,
        |    sum((((31 * 63 + 17 * cell + 7) % 7) - 3) * p
        |        + CASE WHEN cell = 63 THEN p ELSE 0 END) AS n63,
        |    sum((((3 * cell) % 7) - 2) * p) AS nsum
        |  FROM p GROUP BY 1)
        |SELECT doc_id,
        |  CAST(n0 AS DOUBLE) / 1024 AS e0,
        |  CAST(n17 AS DOUBLE) / 1024 AS e17,
        |  CAST(n63 AS DOUBLE) / 1024 AS e63,
        |  CAST(nsum AS DOUBLE) / 1024 AS comp_sum,
        |  64 AS dim
        |FROM e ORDER BY doc_id""".stripMargin))
  )

  /** DuckDB integer luma of the RGB fixture's pixel at offset
    * (dx, dy) from the series position (x.x, y.y) — the SQL mirror of
    * [[Multimodal.lumaAt]] over [[Multimodal.encodePngRgb]]'s analytic
    * bands: band b = (doc_id + (3+b)(x+dx) + (7+2b)(y+dy)) % 256,
    * luma = (77·b0 + 150·b1 + 29·b2) // 256. All operands nonnegative,
    * so DuckDB's floor-`//` equals the JVM's `>> 8`.
    */
  private def lumaSql(dx: Int, dy: Int): String = {
    def band(b: Int): String =
      s"((doc_id + ${3 + b}*(x.x + ($dx)) + ${7 + 2 * b}*(y.y + ($dy))) % 256)"
    s"((77*${band(0)} + 150*${band(1)} + 29*${band(2)}) // 256)"
  }
}
