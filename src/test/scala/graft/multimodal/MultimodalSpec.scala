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

  test("REAL codec fixture: PNG and BMP bytes decode to exact " +
       "dims/channels/pixel-sums; garbage degrades to the sentinel") {
    // real bytes from two genuinely different in-JDK codecs — the
    // verdict-6 contract that the seam is exercised by actual media,
    // not arithmetic stand-ins
    val png = Multimodal.encodePng(5L) // 7×7, samples (5+3x+7y)%256
    val pngMeta = Multimodal.decodeReal(5L, png)
    assert(pngMeta.format === "png")
    assert(pngMeta.width === 7 && pngMeta.height === 7)
    assert(pngMeta.channels === 3)
    val expectedSum = (for { y <- 0 until 7; x <- 0 until 7 }
      yield 3L * ((5L + 3 * x + 7 * y) % 256)).sum
    assert(pngMeta.px_sum === expectedSum,
      "pixel checksum wrong: codec did not decode the raster")

    // BMP through the same decodeReal entry point (ImageIO's BMP
    // writer is also in-JDK): 4×2, constant sample 9 in 3 bands
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 2; x <- 0 until 4; b <- 0 until 3)
      img.getRaster.setSample(x, y, b, 9)
    val bout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bout)
    val bmpMeta = Multimodal.decodeReal(1L, bout.toByteArray)
    assert(bmpMeta.format === "bmp")
    assert(bmpMeta.width === 4 && bmpMeta.height === 2)
    assert(bmpMeta.channels === 3)
    assert(bmpMeta.px_sum === 4L * 2 * 3 * 9)

    // corrupt-media contract: garbage bytes yield the typed sentinel
    // row, never an exception (one bad blob must not kill a partition)
    val junk = Multimodal.decodeReal(2L, Array[Byte](1, 2, 3, 4))
    assert(junk.format === "undecodable" && junk.channels === 0)
    // a valid magic with a truncated body must degrade the same way
    val truncated = Multimodal.decodeReal(3L, png.take(20))
    assert(truncated.format === "undecodable")
  }

  test("REAL JPEG codec: genuinely JPEG-compressed bytes decode " +
       "bit-exactly for the block-constant fixture family; corrupt " +
       "payloads degrade to the sentinel") {
    // the exactness claim the oracle stands on: every id shape
    // (600 covers all 24×18 dim combos several times over) AND every
    // possible sample value round-trips bit-for-bit at quality 1.0
    for (id <- 0L until 600L) {
      val bytes = Multimodal.encodeJpeg(id)
      // genuinely JPEG: SOI marker, not a PNG/BMP in disguise
      assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8,
        s"id=$id fixture is not a JPEG container")
      val m = Multimodal.decodeReal(id, bytes)
      val w = (id % 24 + 2).toInt
      val h = (id % 18 + 2).toInt
      assert(m.format === "jpeg" && m.width === w && m.height === h &&
        m.channels === 1, s"id=$id header mismatch: $m")
      val expected = (for { y <- 0 until h; x <- 0 until w }
        yield (id + 5L * (x / 8) + 11L * (y / 8)) % 256L).sum
      assert(m.px_sum === expected,
        s"id=$id pixel checksum wrong: JPEG decode not bit-exact")
    }
    // every sample value 0-255 survives the lossy round trip exactly
    // (single-block constant image: DC-only DCT, quality-1.0 quant)
    for (v <- 0 until 256) {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 8)
        img.getRaster.setSample(x, y, 0, v)
      // same writer configuration as encodeJpeg, applied to this exact
      // raster, verified through the public decodeReal seam
      val bytes = {
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val out = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream
          .MemoryCacheImageOutputStream(out)
        try {
          writer.setOutput(ios)
          val p = writer.getDefaultWriteParam
          p.setCompressionMode(
            javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionQuality(1.0f)
          writer.write(null,
            new javax.imageio.IIOImage(img, null, null), p)
        } finally { writer.dispose(); ios.close() }
        out.toByteArray
      }
      val m = Multimodal.decodeReal(0L, bytes)
      assert(m.px_sum === 64L * v, s"value $v not exact through JPEG")
    }
    // corrupt-media contract: a valid FFD8 magic with a truncated body
    // yields the typed sentinel, never a task-killing exception
    val truncated = Multimodal.decodeReal(
      7L, Multimodal.encodeJpeg(7L).take(24))
    assert(truncated.format === "undecodable" && truncated.channels === 0)
  }

  test("JPEG roundtrip is partition/batch-invariant; plan has no " +
       "exchange and a doc_id-pruned scan") {
    val docs = Tables.documents(spark, sf)
    val a = Multimodal.decodeRealRoundtrip(
      docs, batchSize = 64, encoder = Multimodal.encodeJpeg).toDF()
    val b = Multimodal.decodeRealRoundtrip(
      docs.repartition(7), batchSize = 1,
      encoder = Multimodal.encodeJpeg).toDF()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.count() === docs.count())
    assert(a.filter(col("format") =!= "jpeg").isEmpty,
      "every synthesized payload must decode as jpeg")
    val plan = a.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"JPEG decode plan shuffles:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan not pruned to doc_id alone:\n$plan")
  }

  test("decodeRealRoundtrip is partition/batch-invariant like the stubs") {
    val docs = Tables.documents(spark, sf)
    val a = Multimodal.decodeRealRoundtrip(docs, batchSize = 64).toDF()
    val b = Multimodal
      .decodeRealRoundtrip(docs.repartition(7), batchSize = 1).toDF()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.count() === docs.count())
    assert(a.filter(col("format") =!= "png").isEmpty,
      "every synthesized payload must decode as png")

    // the 100 TB shape: decode parallelism = scan parallelism. The
    // plan must carry NO Exchange (the codec runs where the scan
    // runs) and the scan must read doc_id alone (column pruning —
    // payload bytes enter at the codec, never through a wide scan).
    val plan = a.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"real-codec decode plan shuffles:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan not pruned to doc_id alone:\n$plan")
  }

  test("media build: duplicate classes are EXACTLY id % 2304 at the " +
       "byte level (the invariant the pipeline_media_build oracle " +
       "stands on)") {
    // dims repeat mod 24 and 18, the raster mod 256; lcm = 2304 and
    // the PNG encoder is deterministic, so same class ⇒ identical
    // bytes. Different class ⇒ different dims or raster ⇒ different
    // bytes. Check both directions across a spread of classes.
    for (id <- 0L until 80L) {
      assert(java.util.Arrays.equals(
        Multimodal.encodePng(id), Multimodal.encodePng(id + 2304L)),
        s"id=$id: same class not byte-identical")
      assert(!java.util.Arrays.equals(
        Multimodal.encodePng(id), Multimodal.encodePng(id + 1152L)),
        s"id=$id: half-period class collided")
    }
  }

  test("media build: the corruption plant is total (every 97th id " +
       "scans to the sentinel, every other id decodes) and the scan " +
       "digest keys byte equality") {
    val spark2 = spark
    import spark2.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val scan = Multimodal.scanMedia(ids, batchSize = 32).toDF().cache()
    try {
      val corrupt = scan.filter(col("doc_id") % 97 === 0)
      assert(corrupt.filter(col("format") =!= "undecodable").isEmpty,
        "a planted truncation decoded")
      val healthy = scan.filter(col("doc_id") % 97 =!= 0)
      assert(healthy.filter(col("format") =!= "png").isEmpty,
        "a healthy payload failed to decode")
      // inside one 2304-period window every id is its own class, so
      // every healthy digest must be unique (md5 keys the bytes)
      val n = healthy.count()
      assert(healthy.select("digest").distinct().count() === n)
    } finally { scan.unpersist(); () }
  }

  test("pipeline_media_build composes gate, dedup and rollup " +
       "(result matches the stage-by-stage recompute)") {
    val q = graft.ops.MultimodalQueries.queries
      .find(_.name == "pipeline_media_build").get
    val result = q.fn(spark, sf).collect()
    // independent recompute from the id arithmetic alone
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val survivors = ids.filter(_ % 97 != 0)
      .groupBy(_ % 2304).values.map(_.min).toSeq
    val expected = survivors.map { id =>
      val w = (id % 24 + 2).toInt
      val h = (id % 18 + 2).toInt
      val s = (for { y <- 0 until h; x <- 0 until w }
        yield 3L * ((id + 3L * x + 7L * y) % 256L)).sum
      (h, s, 3L * w * h)
    }.groupBy(_._1).map { case (h, rows) =>
      h -> ((rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum))
    }
    assert(result.length === expected.size)
    result.foreach { r =>
      val (h, n, px, smp) = (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert((n, px, smp) === expected(h), s"height $h rollup mismatch")
    }
  }

  test("convFeatures/embedPooled consume REAL decoded pixels: analytic " +
      "parity, corrupt-payload degrade, and no zero-norm embedding " +
      "anywhere in the fixture family") {
    // analytic parity for one id: recompute the conv sums and the
    // pooled projection straight from the fixture formula and compare
    // against the codec-decoded path (a broken decode can't match)
    val id = 41L
    val w = (id % 24 + 2).toInt; val h = (id % 18 + 2).toInt
    def v(x: Int, y: Int): Long = (id + 3L * x + 7L * y) % 256L
    var gx = 0L; var lap = 0L
    for (y <- 1 to h - 2; x <- 1 to w - 2) {
      gx += math.abs((v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1))
        - (v(x - 1, y - 1) + 2 * v(x - 1, y) + v(x - 1, y + 1)))
      lap += math.abs(v(x + 1, y) + v(x - 1, y) + v(x, y + 1) +
        v(x, y - 1) - 4 * v(x, y))
    }
    val f = Multimodal.convFeatures(id, Multimodal.encodePng(id))
    assert(f.f0 === gx.toDouble && f.f2 === lap.toDouble)
    val p = new Array[Long](64)
    for (y <- 0 until h; x <- 0 until w)
      p((x * 8 / w) * 8 + (y * 8 / h)) += v(x, y)
    val e = Multimodal.embedPooled(id, Multimodal.encodePng(id), 64)
    (0 until 64).foreach { j =>
      val n = p(j) + (0 until 64).map(c =>
        (((31L * j + 17L * c + 7L) % 7L) - 3L) * p(c)).sum
      assert(e(j) === n.toFloat / 1024.0f, s"component $j")
    }
    // corrupt payloads degrade to the typed sentinel / zero vector
    val corrupt = java.util.Arrays.copyOf(Multimodal.encodePng(3L), 20)
    assert(Multimodal.convFeatures(3L, corrupt).f0 === -1.0)
    assert(Multimodal.embedPooled(3L, corrupt, 64).forall(_ == 0.0f))
    // the residual term guarantees no decodable fixture embeds to the
    // zero vector (the structured weights alone cancel EXACTLY on 7×7
    // grids — id 5 et al.); the fixture family is periodic mod
    // lcm(24, 18, 256) = 2304, so this sweep is exhaustive
    (0L until 2304L).foreach { i =>
      val emb = Multimodal.embedPooled(i, Multimodal.encodePng(i), 64)
      assert(emb.exists(_ != 0.0f), s"zero-norm embedding at id $i")
    }
  }

  test("RGB fixture: bands are distinct, the kernels consume ALL of " +
      "them via exact integer luma, and a band-0-only reader diverges") {
    val id = 41L
    val w = (id % 24 + 2).toInt; val h = (id % 18 + 2).toInt
    // decode and check the three bands really are phase-shifted ramps
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodePngRgb(id)))
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w; b <- 0 until 3)
      assert(r.getSample(x, y, b) ==
        ((id + (3L + b) * x + (7L + 2L * b) * y) % 256L).toInt,
        s"band $b at ($x,$y)")
    // analytic luma parity: conv sums recomputed from the fixture
    // formula through the SAME luma the SQL oracle renders
    def luma(x: Int, y: Int): Long = {
      def band(b: Long) = (id + (3L + b) * x + (7L + 2L * b) * y) % 256L
      (77L * band(0) + 150L * band(1) + 29L * band(2)) >> 8
    }
    var gx = 0L
    for (y <- 1 to h - 2; x <- 1 to w - 2)
      gx += math.abs(
        (luma(x + 1, y - 1) + 2 * luma(x + 1, y) + luma(x + 1, y + 1))
          - (luma(x - 1, y - 1) + 2 * luma(x - 1, y) + luma(x - 1, y + 1)))
    val f = Multimodal.convFeatures(id, Multimodal.encodePngRgb(id))
    assert(f.f0 === gx.toDouble)
    // a band-0-only implementation computes a DIFFERENT f0 here (this
    // is the hash-divergence the r13 oracles pin at the inventory
    // level)
    def v0(x: Int, y: Int): Long = (id + 3L * x + 7L * y) % 256L
    var gx0 = 0L
    for (y <- 1 to h - 2; x <- 1 to w - 2)
      gx0 += math.abs(
        (v0(x + 1, y - 1) + 2 * v0(x + 1, y) + v0(x + 1, y + 1))
          - (v0(x - 1, y - 1) + 2 * v0(x - 1, y) + v0(x - 1, y + 1)))
    assert(gx != gx0,
      "fixture failed to discriminate band-0-only from luma")
    // identical-band fixture lumas to the band value exactly, so the
    // r12 oracles are untouched by the luma change (77+150+29 = 256)
    val same = Multimodal.convFeatures(id, Multimodal.encodePng(id))
    def v(x: Int, y: Int): Long = v0(x, y)
    var gxSame = 0L
    for (y <- 1 to h - 2; x <- 1 to w - 2)
      gxSame += math.abs(
        (v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1))
          - (v(x - 1, y - 1) + 2 * v(x - 1, y) + v(x - 1, y + 1)))
    assert(same.f0 === gxSame.toDouble)
  }

  test("bytesCol override: extractFeatures/batchEmbed consume the " +
      "frame's ACTUAL stored bytes when told to (ADVICE r12 — the " +
      "encoder path must not silently replace caller media)") {
    val ids = Seq(5L, 41L, 100L)
    // a caller's frame of real stored media: RGB payloads under ids
    // whose default-encoder fixtures would be the IDENTICAL-band PNGs
    val frame = spark.createDataFrame(
      ids.map(id => (id, Multimodal.encodePngRgb(id))))
      .toDF("doc_id", "bytes")
    val viaBytes = Multimodal
      .extractFeatures(frame, bytesCol = Some("bytes"))
      .collect().map(f => f.doc_id -> f).toMap
    ids.foreach { id =>
      val expected = Multimodal.convFeatures(id, Multimodal.encodePngRgb(id))
      assert(viaBytes(id) === expected,
        s"bytesCol path did not decode the stored payload for $id")
      // and it is NOT what the default encoder would have produced
      val fixture = Multimodal.convFeatures(id, Multimodal.encodePng(id))
      assert(viaBytes(id).f0 !== fixture.f0,
        s"stored bytes were silently replaced by the fixture for $id")
    }
    // same contract on the embed path
    val emb = Multimodal.batchEmbed(frame, bytesCol = Some("bytes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    ids.foreach { id =>
      val expected =
        Multimodal.embedPooled(id, Multimodal.encodePngRgb(id), 64).toSeq
      assert(emb(id) === expected)
    }
  }

  test("bytesCol null guard (ADVICE r13): a null payload fails fast " +
      "naming the doc_id, not as an ImageIO NPE deep in an executor") {
    val frame = spark.createDataFrame(Seq(
        (5L, Option(Multimodal.encodePngRgb(5L))),
        (41L, Option.empty[Array[Byte]])))
      .toDF("doc_id", "bytes")
    Seq(
      () => Multimodal.extractFeatures(frame, bytesCol = Some("bytes"))
        .collect(),
      () => Multimodal.batchEmbed(frame, bytesCol = Some("bytes"))
        .collect()
    ).foreach { run =>
      val e = intercept[Exception] { run(): Unit }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("null media payload: doc_id=41")),
        s"expected the doc_id-naming guard, got: ${messages(e)}")
    }
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
