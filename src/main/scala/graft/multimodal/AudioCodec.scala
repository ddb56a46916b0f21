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

  // The AudioSystem facade resolves its SPI providers through a
  // SYNCHRONIZED, UNCACHED ServiceLoader scan on EVERY call
  // (JDK13Services.getProviders) — measured here as 32 executor
  // threads achieving 1.9x of the 32x ideal (the per-row codec work
  // serialized on that lock, and the sf0.1→sf1 bench step went 33x at
  // 10x data). Resolving the WAVE reader/writer ONCE through the same
  // public SPI (javax.sound.sampled.spi) and invoking the providers
  // directly removes the global lock from the hot loop; the codec
  // implementations that run are the identical JDK ones.
  private lazy val audioReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // WAVE readers FIRST: the JDK's SPI order probes the Gervill
    // SoftMidiAudioFileReader before WaveFileReader, and that probe
    // synchronizes every thread on the soft-synth global state —
    // measured as 0.9x of ideal at 32 threads (i.e. fully serial).
    // The payloads this engine decodes are magic-sniffed RIFF/WAVE, so
    // the wave readers accept them and the MIDI probe never runs; any
    // other container still falls through the full SPI chain.
    b.result().sortBy(r =>
      if (r.getClass.getSimpleName.contains("Wave")) 0 else 1)
  }
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(
          javax.sound.sampled.AudioFileFormat.Type.WAVE)) found = w
    }
    require(found != null, "no WAVE writer provider in this JVM")
    found
  }

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
    try wavWriter.write(
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
      // standard SPI dispatch (what AudioSystem does behind its lock):
      // the first provider that recognizes the container wins
      val ais = {
        var found: javax.sound.sampled.AudioInputStream = null
        val it = audioReaders.iterator
        while (found == null && it.hasNext) {
          val r = it.next()
          try found = r.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => ()
          }
        }
        if (found == null) return sentinel
        found
      }
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
