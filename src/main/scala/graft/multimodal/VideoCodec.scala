package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL video path through the partition-batched multimodal seam —
  * closes the "video decode remains a stub" gap (SURVEY.md north-star
  * M6; reference semantics: media payloads as opaque binary + typed
  * metadata).
  *
  * Format: MJPEG in an AVI (RIFF) container — the oldest and most
  * durable container/codec pair a crawl actually yields, and the one
  * that is fully decodable with nothing but the in-JDK ImageIO JPEG
  * reader. The DECODER is the deliverable: a real RIFF demuxer that
  * walks the chunk tree (`hdrl`→`avih` for stream metadata,
  * `movi`→`##dc` for frame payloads) and fully decodes every sampled
  * frame's entropy-coded DCT with ImageIO. The fixture WRITER builds a
  * spec-complete container (avih + strh/strf headers + movi + idx1
  * keyframe index) around genuinely JPEG-compressed frames from the
  * block-constant family `mm_decode_jpeg` proved bit-exact at
  * compression quality 1.0 — so dims, frame count, fps and the
  * all-frames raster checksum are pure integer functions of the doc id
  * that a SQL oracle reproduces exactly.
  *
  * Corrupt payloads (bad magic, truncated chunks, undecodable frames)
  * degrade to a typed sentinel row, never a task failure — the same
  * crawl-scale contract as [[Multimodal.decodeReal]].
  */
object VideoCodec {

  /** Decoded-video metadata + all-frames raster checksum. */
  final case class VideoMeta(doc_id: Long, width: Int, height: Int,
      n_frames: Long, fps: Int, format: String, px_sum: Long)

  /** One sampled, fully decoded frame: `f_sum` checksums every raster
    * sample of that frame.
    */
  final case class VideoFrame(doc_id: Long, frame_idx: Int, f_sum: Long)

  /** Fixture shape — all pure functions of the id.  fps values divide
    * 1,000,000 so `dwMicroSecPerFrame` round-trips exactly.
    */
  @inline def fixtureW(id: Long): Int = (id % 16 + 8).toInt
  @inline def fixtureH(id: Long): Int = (id % 12 + 8).toInt
  @inline def fixtureFrames(id: Long): Int = (id % 5 + 2).toInt
  @inline def fixtureFps(id: Long): Int = (id % 4) match {
    case 0 => 10
    case 1 => 16
    case 2 => 20
    case _ => 25
  }

  /** Frame `f`'s grayscale sample in block (bx, by) — the same
    * block-constant family as [[Multimodal.encodeJpeg]] (DC-only DCT,
    * exact at quality 1.0), extended with a per-frame term.
    */
  @inline def fixtureBlockSample(id: Long, f: Int, bx: Int, by: Int): Int =
    ((id + 13L * f + 5L * bx + 11L * by) % 256L).toInt

  private def encodeJpegFrame(id: Long, f: Int, w: Int, h: Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r.setSample(x, y, 0, fixtureBlockSample(id, f, x / 8, y / 8))
        x += 1
      }
      y += 1
    }
    Multimodal.writeImage(img, "jpeg", Some(1.0f))
  }

  // ---------------- RIFF writing (fixture side) ----------------

  private def le32(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** `<fourcc><size><body>[pad]` — RIFF chunks are word-aligned. */
  private def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    fourcc(cc) ++ le32(body.length) ++ body ++ pad
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(listType) ++ body)

  /** Deterministic real AVI/MJPEG bytes for a doc id: a spec-complete
    * RIFF container (avih main header, vids strh + BITMAPINFOHEADER
    * strf, movi frame chunks, idx1 keyframe index) whose `##dc`
    * payloads are genuinely JPEG-compressed frames.
    */
  def encodeAvi(id: Long): Array[Byte] = {
    val w = fixtureW(id)
    val h = fixtureH(id)
    val nf = fixtureFrames(id)
    val fps = fixtureFps(id)
    val frames = (0 until nf).map(f => encodeJpegFrame(id, f, w, h))
    val maxFrame = frames.map(_.length).max

    val avih = chunk("avih",
      le32(1000000 / fps) ++          // dwMicroSecPerFrame
      le32(maxFrame * fps) ++         // dwMaxBytesPerSec
      le32(0) ++                      // dwPaddingGranularity
      le32(0x10) ++                   // dwFlags: AVIF_HASINDEX
      le32(nf) ++                     // dwTotalFrames
      le32(0) ++                      // dwInitialFrames
      le32(1) ++                      // dwStreams
      le32(maxFrame) ++               // dwSuggestedBufferSize
      le32(w) ++ le32(h) ++           // dwWidth, dwHeight
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)) // dwReserved[4]

    val strh = chunk("strh",
      fourcc("vids") ++ fourcc("MJPG") ++
      le32(0) ++                      // dwFlags
      le16(0) ++ le16(0) ++           // wPriority, wLanguage
      le32(0) ++                      // dwInitialFrames
      le32(1) ++ le32(fps) ++         // dwScale, dwRate (fps = rate/scale)
      le32(0) ++ le32(nf) ++          // dwStart, dwLength
      le32(maxFrame) ++               // dwSuggestedBufferSize
      le32(0xffffffff.toInt) ++       // dwQuality (default)
      le32(0) ++                      // dwSampleSize (0: varying)
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)) // rcFrame

    val strf = chunk("strf",          // BITMAPINFOHEADER
      le32(40) ++ le32(w) ++ le32(h) ++
      le16(1) ++ le16(24) ++          // biPlanes, biBitCount
      fourcc("MJPG") ++               // biCompression
      le32(w * h * 3) ++              // biSizeImage (nominal)
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))

    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val moviChunks = frames.map(fb => chunk("00dc", fb))
    val movi = list("movi", moviChunks.flatten.toArray)

    // idx1: one keyframe entry per frame; offsets relative to the
    // 'movi' fourcc per the original AVI convention
    var off = 4
    val idxBody = moviChunks.flatMap { c =>
      val e = fourcc("00dc") ++ le32(0x10) ++ le32(off) ++ le32(c.length - 8 -
        (if ((c.length - 8) % 2 == 1) 1 else 0))
      off += c.length
      e
    }.toArray
    val idx1 = chunk("idx1", idxBody)

    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  // ---------------- RIFF parsing (the deliverable) ----------------

  @inline private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
    ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  @inline private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parsed container: avih fields + the raw bytes of every video
    * frame chunk (`##dc`/`##db`), in stream order.
    */
  private final case class AviStream(width: Int, height: Int,
      totalFrames: Int, usPerFrame: Int, frames: Vector[Array[Byte]])

  /** Walk the RIFF chunk tree. Returns None for anything malformed —
    * bad magic, sizes pointing past the buffer, missing avih/movi.
    */
  private def parseAvi(bytes: Array[Byte]): Option[AviStream] = {
    if (bytes == null || bytes.length < 24) return None
    if (cc(bytes, 0) != "RIFF" || cc(bytes, 8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + rdLe32(bytes, 4)).toInt
    var width = -1; var height = -1; var total = -1; var usPf = 0
    val frames = Vector.newBuilder[Array[Byte]]
    var sawMovi = false

    // walk one LIST body; `depth` bounds hostile recursion
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      if (depth > 8) return false
      var pos = start
      while (pos + 8 <= end) {
        val id = cc(bytes, pos)
        val size = rdLe32(bytes, pos + 4)
        val bodyStart = pos + 8
        if (size < 0 || bodyStart + size > end) return false
        if (id == "LIST") {
          if (size < 4) return false
          val ltype = cc(bytes, bodyStart)
          if (ltype == "movi") sawMovi = true
          if (ltype == "hdrl" || ltype == "strl" || ltype == "movi" ||
              ltype == "rec ") {
            if (!walk(bodyStart + 4, bodyStart + size, depth + 1))
              return false
          }
        } else if (id == "avih") {
          if (size < 40) return false
          usPf = rdLe32(bytes, bodyStart)
          total = rdLe32(bytes, bodyStart + 16)
          width = rdLe32(bytes, bodyStart + 32)
          height = rdLe32(bytes, bodyStart + 36)
        } else if (id.length == 4 && id.charAt(2) == 'd' &&
                   (id.charAt(3) == 'c' || id.charAt(3) == 'b') &&
                   Character.isDigit(id.charAt(0)) &&
                   Character.isDigit(id.charAt(1))) {
          frames += java.util.Arrays.copyOfRange(
            bytes, bodyStart, bodyStart + size)
        }
        pos = bodyStart + size + (size & 1) // word alignment
      }
      true
    }

    if (!walk(12, riffEnd, 0)) None
    else {
      val fs = frames.result()
      if (width <= 0 || height <= 0 || !sawMovi || fs.isEmpty) None
      else Some(AviStream(width, height, total, usPf, fs))
    }
  }

  /** Fully decode one JPEG frame and checksum its raster; -1 on any
    * codec failure (NonFatal for the same adversarial-bytes reason as
    * [[Multimodal.decodeReal]]).
    */
  private def frameSum(frame: Array[Byte]): Long = {
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(frame))
      val img =
        try javax.imageio.ImageIO.read(iis)
        finally {
          try iis.close()
          catch { case _: java.io.IOException => () }
        }
      if (img == null) -1L
      else {
        val r = img.getRaster
        val w = img.getWidth; val h = img.getHeight
        val ch = r.getNumBands
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < ch) { sum += r.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        sum
      }
    } catch { case scala.util.control.NonFatal(_) => -1L }
  }

  /** REAL decode: demux the container, decode EVERY frame, return
    * metadata + the all-frames raster checksum. Malformed container or
    * any undecodable frame → typed sentinel.
    */
  def decodeAvi(id: Long, bytes: Array[Byte]): VideoMeta =
    parseAvi(bytes) match {
      case None =>
        VideoMeta(id, -1, -1, -1L, 0, "undecodable", 0L)
      case Some(s) =>
        var sum = 0L
        var bad = false
        s.frames.foreach { f =>
          val fs = frameSum(f)
          if (fs < 0) bad = true else sum += fs
        }
        if (bad) VideoMeta(id, -1, -1, -1L, 0, "undecodable", 0L)
        else VideoMeta(id, s.width, s.height, s.frames.size.toLong,
          if (s.usPerFrame > 0) 1000000 / s.usPerFrame else 0,
          "mjpeg", sum)
    }

  /** Frame sampling on REAL video: demux, decode ONLY every `step`-th
    * frame (the whole point of sampling — skipped frames are never
    * entropy-decoded), emit one row per sampled frame. Malformed
    * payloads yield no rows (metadata-side handling is
    * [[decodeAvi]]'s job).
    */
  def decodeAviFrames(id: Long, bytes: Array[Byte], step: Int)
      : Seq[VideoFrame] =
    parseAvi(bytes) match {
      case None => Seq.empty
      case Some(s) =>
        (0 until s.frames.size by step).flatMap { f =>
          val fs = frameSum(s.frames(f))
          if (fs < 0) None else Some(VideoFrame(id, f, fs))
        }
    }

  /** Encode-then-decode through the partition-batched seam — same
    * contract as [[Multimodal.decodeRealRoundtrip]]: no shuffle,
    * decode parallelism = scan parallelism, one batched call site.
    */
  def decodeAviRoundtrip(docs: DataFrame, batchSize: Int = 64,
                         idCol: String = "doc_id"): Dataset[VideoMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { ids =>
          ids.map(id => decodeAvi(id, encodeAvi(id)))
        }
      }
  }

  /** Frame-sampled roundtrip: the row-multiplying explode of
    * [[Multimodal.sampleFrames]], but over genuinely decoded frames.
    */
  def frameSampleRoundtrip(docs: DataFrame, step: Int = 2,
                           batchSize: Int = 64,
                           idCol: String = "doc_id")
      : Dataset[VideoFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { ids =>
          ids.flatMap(id => decodeAviFrames(id, encodeAvi(id), step))
        }
      }
  }
}
