package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Real-codec proofs for the last two stubbed modalities (r11): WAV
  * PCM audio via javax.sound.sampled and MJPEG-in-AVI video via a real
  * RIFF demuxer + ImageIO. Expectations are recomputed INLINE from the
  * fixture arithmetic (not by calling the fixture helpers), so a bug
  * in the shared constants cannot self-verify.
  */
class AudioVideoCodecSpec extends SparkSpec {

  // ---------------- audio ----------------

  private def wavExpected(id: Long): (Int, Int, Long, Long, Long) = {
    val ch = (id % 2 + 1).toInt
    val rate = (8000 + (id % 3) * 4000).toInt
    val nf = (id % 120 + 30).toInt
    var smp = 0L
    var zc = 0L
    var c = 0
    while (c < ch) {
      var prevNeg = false
      var i = 0
      while (i < nf) {
        val v = ((id * 31 + i * 17 + c * 7919) % 65536 - 32768).toInt
        smp += v
        val neg = v < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      c += 1
    }
    (ch, rate, nf.toLong, smp, zc)
  }

  test("WAV roundtrip is exact across every fixture shape (ids 0-299): " +
       "rate/channels/frames/sample-checksum/zero-crossings") {
    (0L until 300L).foreach { id =>
      val m = AudioCodec.decodeWav(id, AudioCodec.encodeWav(id))
      val (ch, rate, nf, smp, zc) = wavExpected(id)
      withClue(s"id=$id:") {
        assert(m.format === "wav")
        assert(m.channels === ch)
        assert(m.sample_rate === rate)
        assert(m.n_frames === nf)
        assert(m.smp_sum === smp,
          "sample checksum wrong: codec did not decode the PCM frames")
        assert(m.zero_cross === zc)
      }
    }
  }

  test("WAV: the JDK codec genuinely wrote a RIFF/WAVE container") {
    val b = AudioCodec.encodeWav(42L)
    assert(new String(b, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") === "WAVE")
    // and the payload is real: 2 channels (42%2+1... = 1), 72 frames
    val m = AudioCodec.decodeWav(42L, b)
    assert(m.channels === 1 && m.n_frames === 72L)
  }

  test("WAV corrupt-media contract: garbage, truncation and non-RIFF " +
       "bytes degrade to the typed sentinel, never a throw") {
    val good = AudioCodec.encodeWav(7L)
    val truncated = java.util.Arrays.copyOf(good, good.length / 3)
    val garbage = Array.tabulate[Byte](256)(i => (i * 37 % 251).toByte)
    Seq(null, Array.empty[Byte], garbage, truncated,
        "not audio at all".getBytes("UTF-8")).foreach { bad =>
      val m = AudioCodec.decodeWav(99L, bad)
      assert(m.format === "undecodable" && m.sample_rate === -1,
        "corrupt payload did not yield the sentinel")
      assert(m.doc_id === 99L)
    }
  }

  test("WAV decode output is independent of partitioning and batching") {
    val docs = Tables.documents(spark, sf).limit(64)
    val a = AudioCodec.decodeWavRoundtrip(docs, batchSize = 64).toDF()
    val b = AudioCodec
      .decodeWavRoundtrip(docs.repartition(7), batchSize = 1).toDF()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  // ---------------- video ----------------

  private def aviExpected(id: Long): (Int, Int, Long, Int, Long) = {
    val w = (id % 16 + 8).toInt
    val h = (id % 12 + 8).toInt
    val nf = (id % 5 + 2).toInt
    val fps = (id % 4) match {
      case 0 => 10; case 1 => 16; case 2 => 20; case _ => 25
    }
    var sum = 0L
    for (f <- 0 until nf; bx <- 0 to 2 if 8 * bx < w;
         by <- 0 to 2 if 8 * by < h) {
      val v = (id + 13 * f + 5 * bx + 11 * by) % 256
      sum += v * math.min(8, w - 8 * bx) * math.min(8, h - 8 * by)
    }
    (w, h, nf.toLong, fps, sum)
  }

  test("AVI/MJPEG roundtrip is exact across every fixture shape " +
       "(ids 0-239 = full w×h×frames×fps lattice): dims, frame count, " +
       "fps, all-frames raster checksum") {
    (0L until 240L).foreach { id =>
      val m = VideoCodec.decodeAvi(id, VideoCodec.encodeAvi(id))
      val (w, h, nf, fps, sum) = aviExpected(id)
      withClue(s"id=$id:") {
        assert(m.format === "mjpeg")
        assert(m.width === w && m.height === h)
        assert(m.n_frames === nf)
        assert(m.fps === fps)
        assert(m.px_sum === sum,
          "raster checksum wrong: frames were not actually JPEG-decoded")
      }
    }
  }

  test("AVI container is spec-shaped: RIFF/AVI magic, hdrl before movi, " +
       "an idx1 keyframe index, genuinely JPEG-compressed frame chunks") {
    val b = VideoCodec.encodeAvi(17L)
    assert(new String(b, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") === "AVI ")
    val s = new String(b.map(x => if (x >= 32 && x < 127) x.toChar else '.'))
    val hdrl = s.indexOf("hdrl"); val movi = s.indexOf("movi")
    val idx1 = s.indexOf("idx1"); val dc = s.indexOf("00dc")
    assert(hdrl > 0 && movi > hdrl && idx1 > movi && dc > movi)
    // the first frame chunk body starts with the JPEG SOI marker
    val dcOff = {
      var i = 12; var found = -1
      while (found < 0 && i + 8 < b.length) {
        if (b(i) == '0' && b(i + 1) == '0' && b(i + 2) == 'd' &&
            b(i + 3) == 'c') found = i
        else i += 1
      }
      found
    }
    assert(dcOff > 0)
    assert((b(dcOff + 8) & 0xff) === 0xff && (b(dcOff + 9) & 0xff) === 0xd8,
      "frame chunk is not JPEG-compressed")
  }

  test("AVI frame sampling decodes only every step-th frame with exact " +
       "per-frame checksums") {
    (0L until 60L).foreach { id =>
      val nf = (id % 5 + 2).toInt
      val frames = VideoCodec.decodeAviFrames(id, VideoCodec.encodeAvi(id),
        step = 2)
      assert(frames.map(_.frame_idx) === (0 until nf by 2).toVector,
        s"id=$id: wrong sampled indices")
      frames.foreach { fr =>
        val w = (id % 16 + 8).toInt
        val h = (id % 12 + 8).toInt
        var sum = 0L
        for (bx <- 0 to 2 if 8 * bx < w; by <- 0 to 2 if 8 * by < h) {
          val v = (id + 13 * fr.frame_idx + 5 * bx + 11 * by) % 256
          sum += v * math.min(8, w - 8 * bx) * math.min(8, h - 8 * by)
        }
        assert(fr.f_sum === sum, s"id=$id frame=${fr.frame_idx}")
      }
    }
  }

  test("AVI corrupt-media contract: garbage, truncated container, and a " +
       "valid container with an undecodable frame all degrade safely") {
    val good = VideoCodec.encodeAvi(3L)
    val truncated = java.util.Arrays.copyOf(good, good.length / 2)
    val garbage = Array.tabulate[Byte](512)(i => (i * 31 % 241).toByte)
    Seq(null, Array.empty[Byte], garbage,
        "RIFFxxxxNOPE".getBytes("US-ASCII")).foreach { bad =>
      val m = VideoCodec.decodeAvi(5L, bad)
      assert(m.format === "undecodable" && m.width === -1)
    }
    // truncation mid-chunk must not throw either
    assert(VideoCodec.decodeAvi(5L, truncated).doc_id === 5L)
    // corrupt FRAME inside a well-formed container: flip bytes in the
    // first frame's entropy-coded segment
    val broken = good.clone()
    var i = 12
    var dcOff = -1
    while (dcOff < 0 && i + 8 < broken.length) {
      if (broken(i) == '0' && broken(i + 1) == '0' && broken(i + 2) == 'd' &&
          broken(i + 3) == 'c') dcOff = i
      else i += 1
    }
    // zero out the frame body past the SOI marker (kills the JPEG
    // structure but leaves the RIFF chunk sizes intact)
    (dcOff + 10 until dcOff + 40).foreach(j => broken(j) = 0)
    val m = VideoCodec.decodeAvi(5L, broken)
    assert(m.format === "undecodable",
      "undecodable frame must surface as the sentinel, not a partial sum")
    // and the frame-sampling path yields no rows rather than throwing
    assert(VideoCodec.decodeAviFrames(5L, garbage, 2).isEmpty)
  }

  test("AVI decode output is independent of partitioning and batching") {
    val docs = Tables.documents(spark, sf).limit(48)
    val a = VideoCodec.decodeAviRoundtrip(docs, batchSize = 64).toDF()
    val b = VideoCodec
      .decodeAviRoundtrip(docs.repartition(5), batchSize = 1).toDF()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
