package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL audio codec through the partition-batched multimodal seam —
  * closes the "audio decode remains a stub" gap the same way
  * `mm_decode_real`/`mm_decode_jpeg` closed it for images
  * (reference semantics: media payloads as opaque binary + typed
  * metadata, SURVEY.md north-star M6).
  *
  * Format: RIFF/WAVE carrying 16-bit signed little-endian PCM — the
  * interchange format every crawl-scale audio pipeline normalizes to
  * before feature extraction. Both directions run through the JDK's
  * real `javax.sound.sampled` codec (no new dependencies): the fixture
  * encoder hands raw frames to `AudioSystem.write`, which builds the
  * RIFF container; the decoder hands untrusted bytes to
  * `AudioSystem.getAudioInputStream`, which parses the chunk structure
  * and exposes the stream's `AudioFormat`. PCM is lossless, so every
  * decoded sample is a pure integer function of the doc id and a SQL
  * oracle reproduces the checksum exactly.
  *
  * The decoded-side contract mirrors [[Multimodal.decodeReal]]:
  * `smp_sum` checksums EVERY decoded sample (right only if the codec
  * actually unpacked the PCM frames), `zero_cross` is a real DSP
  * feature (per-channel sign-change count) computed from the same
  * decoded samples, and corrupt payloads degrade to a typed sentinel
  * row instead of killing the partition.
  */
object AudioCodec {

  /** Decoded-audio metadata + content checksum + one real DSP feature. */
  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, format: String, smp_sum: Long, zero_cross: Long)

  /** Fixture PCM sample for (id, frame, channel) — pure integer
    * arithmetic a SQL oracle reproduces: value in [-32768, 32767].
    */
  @inline def fixtureSample(id: Long, frame: Int, channel: Int): Int =
    ((id * 31L + frame * 17L + channel * 7919L) % 65536L - 32768L).toInt

  /** Fixture shape: channels ∈ {1, 2}, rate ∈ {8000, 12000, 16000},
    * 30–149 frames — all pure functions of the id.
    */
  @inline def fixtureChannels(id: Long): Int = (id % 2 + 1).toInt
  @inline def fixtureRate(id: Long): Int = (8000 + (id % 3) * 4000).toInt
  @inline def fixtureFrames(id: Long): Int = (id % 120 + 30).toInt

  /** Deterministic real WAV bytes for a doc id: interleaved 16-bit LE
    * PCM frames handed to the JDK's WAVE writer (the real codec builds
    * the RIFF/fmt/data chunk structure, not this fixture).
    */
  def encodeWav(id: Long): Array[Byte] = {
    val ch = fixtureChannels(id)
    val rate = fixtureRate(id)
    val nFrames = fixtureFrames(id)
    val pcm = new Array[Byte](nFrames * ch * 2)
    var i = 0
    var off = 0
    while (i < nFrames) {
      var c = 0
      while (c < ch) {
        val v = fixtureSample(id, i, c)
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        off += 2
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, ch, ch * 2, rate.toFloat, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    finally ais.close()
    out.toByteArray
  }

  /** REAL decode: the JDK codec parses the RIFF container and returns
    * the stream format; this reads every PCM frame back out and
    * computes the checksum + zero-crossing feature. Any malformed
    * payload (bad magic, truncated chunks, non-PCM encoding) degrades
    * to the typed sentinel — the corrupt-media contract
    * ([[Multimodal.decodeReal]]'s NonFatal rationale applies verbatim:
    * at crawl scale a bad blob is data, not a task failure).
    */
  def decodeWav(id: Long, bytes: Array[Byte]): AudioMeta = {
    val sentinel = AudioMeta(id, -1, 0, -1L, "undecodable", 0L, 0L)
    if (bytes == null || bytes.length < 12 ||
        bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E') return sentinel
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val ch = fmt.getChannels
        val ok =
          fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian && ch >= 1
        if (!ok) sentinel
        else {
          val frameBytes = fmt.getFrameSize
          val declared = ais.getFrameLength // from the data chunk header
          val data = ais.readAllBytes()
          val nFrames = data.length / frameBytes
          // a truncated file parses fine (the header survives, frames
          // don't) — surface it as corrupt media, not a short clip
          if (declared >= 0 && nFrames < declared) return sentinel
          var smpSum = 0L
          var zc = 0L
          // previous-sample sign per channel (for the crossing count)
          val prevNeg = new Array[Boolean](ch)
          var i = 0
          while (i < nFrames) {
            var c = 0
            while (c < ch) {
              val off = i * frameBytes + c * 2
              val v = ((data(off) & 0xff) | (data(off + 1) << 8)).toShort
                .toInt
              smpSum += v
              val neg = v < 0
              if (i > 0 && neg != prevNeg(c)) zc += 1
              prevNeg(c) = neg
              c += 1
            }
            i += 1
          }
          AudioMeta(id, fmt.getSampleRate.toInt, ch, nFrames.toLong,
            "wav", smpSum, zc)
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => sentinel }
  }

  /** Encode-then-decode through the same partition-batched seam as
    * [[Multimodal.decodeRealRoundtrip]]: no shuffle, decode parallelism
    * = scan parallelism, one batched call site per `batchSize` group.
    */
  def decodeWavRoundtrip(docs: DataFrame, batchSize: Int = 64,
                         idCol: String = "doc_id"): Dataset[AudioMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { ids =>
          // batch boundary = one vectorized codec call site
          ids.map(id => decodeWav(id, encodeWav(id)))
        }
      }
  }
}
