package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

class IvfSpec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)
  private def planted = SimilarityQueries.plantedVecs(spark, sf)

  test("IVF retrieves the planted near-identical vector at rank 1") {
    val queries = planted.filter(col("vec_id") >= graft.ops.SimilarityQueries.PlantedIdOffset)
    val top = Similarity.ivfTopK(planted, queries, 1, nlist = 16, nprobe = 3)
    val hits = top.filter(col("cand_id") === col("query_id") - graft.ops.SimilarityQueries.PlantedIdOffset)
    val total = queries.count()
    // a near-identical vector lands in the same best cell virtually
    // always; nprobe=3 covers quantization boundary wobble
    assert(hits.count() >= (total * 0.9).toLong,
      s"IVF recall ${hits.count()}/$total")
  }

  test("IVF scores agree with brute force on shared candidates") {
    val queries = vecs.filter(col("vec_id") < 4)
    val brute = Similarity.bruteForceTopK(vecs, queries, 2000)
      .select("query_id", "cand_id", "cosine")
    val ivf = Similarity.ivfTopK(vecs, queries, 50)
      .select("query_id", "cand_id", "cosine")
    assert(ivf.except(brute).isEmpty,
      "IVF produced a (query,cand,cosine) brute force disagrees with")
  }

  test("Lloyd refinement lowers mean quantization error, keeps recall") {
    import org.apache.spark.sql.DataFrame
    def meanBestSim(cents: Array[(Int, Array[Double])],
                    corpus: DataFrame): Double = {
      val best = cents.map { case (_, v) =>
        Similarity.cosine(col("embedding"),
          org.apache.spark.sql.functions.typedlit(v))
      }.reduce((a, b) => greatest(a, b))
      corpus.agg(avg(best)).head().getDouble(0)
    }
    val corpus = vecs
    val n = corpus.count()
    val stride = math.max(1L, n / 16)
    val seeds = corpus
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * 16)
      .select(expr(s"cast(vec_id div $stride as int)"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val refined = Similarity.refineCentroids(corpus, seeds, iters = 2)
    val before = meanBestSim(seeds, corpus)
    val after = meanBestSim(refined, corpus)
    // Lloyd monotonically improves within-cell similarity (mean cosine
    // to the nearest centroid) — require a real improvement, not noise
    assert(after > before + 1e-4, s"refine did not improve: $before -> $after")

    // recall with refined centroids stays at the planted-dup bar
    val queries = planted.filter(col("vec_id") >= graft.ops.SimilarityQueries.PlantedIdOffset)
    val top = Similarity.ivfTopK(planted, queries, 1, nlist = 16,
      nprobe = 3, refineIters = 2)
    val hits = top.filter(col("cand_id") === col("query_id") - graft.ops.SimilarityQueries.PlantedIdOffset)
    assert(hits.count() >= (queries.count() * 0.9).toLong)
  }

  test("sample-trained centroids beat strided seeds on cell fit, " +
       "keep planted-dup recall") {
    val corpus = vecs
    val n = corpus.count()
    val stride = math.max(1L, n / 16)
    val seeds = corpus
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * 16)
      .select(expr(s"cast(vec_id div $stride as int)"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val trained = Similarity.trainCentroids(corpus, nlist = 16,
      sampleN = 2000, iters = 4)
    assert(trained.length == 16)

    def meanBestSim(cents: Array[(Int, Array[Double])]): Double = {
      val best = cents.map { case (_, v) =>
        Similarity.cosine(col("embedding"), typedlit(v))
      }.reduce((a, b) => greatest(a, b))
      corpus.agg(avg(best)).head().getDouble(0)
    }
    // maxmin seeding + Lloyd on a 2000-point sample should fit the
    // corpus at least as well as arbitrary id-strided corpus vectors
    assert(meanBestSim(trained) > meanBestSim(seeds) - 1e-9,
      "trained centroids fit worse than strided seeds")

    val queries = planted.filter(col("vec_id") >= graft.ops.SimilarityQueries.PlantedIdOffset)
    val top = Similarity.ivfTopK(planted, queries, 1, nprobe = 3,
      centroids = Some(Similarity.trainCentroids(planted, 16, 2000, 4)))
    val hits = top.filter(col("cand_id") === col("query_id") - graft.ops.SimilarityQueries.PlantedIdOffset)
    assert(hits.count() >= (queries.count() * 0.9).toLong,
      "trained-IVF recall below planted-dup bar")
  }

  test("trainCentroids survives zero vectors in the sample") {
    // an all-zero corpus guarantees the FIRST sampled vector is zero —
    // the case where an undefined (NaN) cosine would poison every
    // maxmin comparison and crash seeding with arg = -1
    val zeros = spark.range(0, 200).select(col("id").as("vec_id"),
      typedlit(Array.fill(16)(0.0)).as("embedding"))
    val cents = Similarity.trainCentroids(zeros, 4, 100, 2)
    assert(cents.length == 4)
    assert(cents.forall(_._2.forall(d => !d.isNaN)))

    // mixed corpus where the FIRST sampled vector is (almost surely) a
    // zero: seeding must still spread over the real vectors instead of
    // collapsing every seed onto the zero index (cos(zero,·) = 0 would
    // stay the argmin forever without explicit seed marking)
    val mixed = zeros.limit(10).unionByName(
      vecs.select(col("vec_id") + 1000L, slice(col("embedding"), 1, 16))
        .toDF("vec_id", "embedding"))
    val trained = Similarity.trainCentroids(mixed, 8, 2000, 0)
    val distinct = trained.map(_._2.toSeq).distinct.length
    assert(distinct >= 4,
      s"seeding collapsed: only $distinct distinct centroids")
  }

  test("trainCentroids is deterministic across invocations") {
    val a = Similarity.trainCentroids(vecs, 8, 500, 2)
    val b = Similarity.trainCentroids(vecs, 8, 500, 2)
    assert(a.length == b.length &&
      a.zip(b).forall { case ((i1, v1), (i2, v2)) =>
        i1 == i2 && java.util.Arrays.equals(v1, v2) })
  }

  test("training memo: repeat calls hit the cache, independently-built " +
      "reads of the same corpus share one artifact, and a cached hit " +
      "is immune to caller mutation") {
    Similarity.clearTrainingMemo()
    val a = Similarity.trainCentroids(vecs, 8, 500, 2)
    val (size1, hits1) = Similarity.trainingMemoStats
    assert(size1 == 1 && hits1 == 0)
    // a SECOND DataFrame built independently over the same data must
    // canonicalize to the same key — this is what lets every query in
    // the bench family reuse one training pass
    val again = Similarity.trainCentroids(
      SimilarityQueries.doubleVecs(spark, sf), 8, 500, 2)
    val (size2, hits2) = Similarity.trainingMemoStats
    assert(size2 == 1 && hits2 == 1,
      s"expected a memo hit, got size=$size2 hits=$hits2")
    assert(a.zip(again).forall { case ((i1, v1), (i2, v2)) =>
      i1 == i2 && java.util.Arrays.equals(v1, v2) })
    // different params → different artifact, no false sharing
    Similarity.trainCentroids(vecs, 4, 500, 2)
    assert(Similarity.trainingMemoStats._1 == 2)
    // returned arrays are clones: trashing one caller's copy must not
    // poison the cache for the next
    a(0)._2(0) = Double.NaN
    val c = Similarity.trainCentroids(vecs, 8, 500, 2)
    assert(!c(0)._2(0).isNaN, "cache contaminated by caller mutation")
    Similarity.clearTrainingMemo()
  }

  test("memo identity: two SAME-SHAPE corpora (equal schema, equal " +
      "row count, different values, different paths) never share an " +
      "artifact — the ADVICE r12 collision scenario") {
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_memoid_a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_memoid_b").toString
    // equal cardinality and schema; different content
    spark.range(0, 400).selectExpr("id AS vec_id",
      "transform(sequence(0, 7), j -> cast(hash(id, j) % 100 AS double))" +
        " AS embedding")
      .write.mode("overwrite").parquet(dirA)
    spark.range(0, 400).selectExpr("id AS vec_id",
      "transform(sequence(0, 7), j -> cast(hash(id + 7, j) % 100 AS " +
        "double)) AS embedding")
      .write.mode("overwrite").parquet(dirB)
    Similarity.clearTrainingMemo()
    val a = Similarity.trainCentroids(spark.read.parquet(dirA), 8, 300, 2)
    val b = Similarity.trainCentroids(spark.read.parquet(dirB), 8, 300, 2)
    // two distinct artifacts cached — the plan string alone would have
    // collided (HadoopFsRelation prints no data location); the key's
    // root-path + file-listing digest keeps them apart
    assert(Similarity.trainingMemoStats._1 == 2,
      s"same-shape corpora collided: ${Similarity.trainingMemoStats}")
    assert(!a.zip(b).forall { case ((_, v1), (_, v2)) =>
      java.util.Arrays.equals(v1, v2) },
      "distinct corpora trained identical centroids — collision")
    // and a rewritten-in-place corpus (same path, same count, new
    // content ⇒ new file listing) keys differently too
    spark.range(0, 400).selectExpr("id AS vec_id",
      "transform(sequence(0, 7), j -> cast(hash(id + 13, j) % 100 AS " +
        "double)) AS embedding")
      .write.mode("overwrite").parquet(dirA)
    Similarity.trainCentroids(spark.read.parquet(dirA), 8, 300, 2): Unit
    assert(Similarity.trainingMemoStats._1 == 3,
      "in-place rewrite reused the stale artifact")
    Similarity.clearTrainingMemo()
  }

  test("disk mirror: an artifact trained in one session is reused " +
      "across a simulated JVM restart bit-identically, and a corrupt " +
      "file degrades to a retrain, never an error") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_train_cache_spec").toFile
    val saved = Similarity.trainingArtifactDir
    try {
      Similarity.setTrainingArtifactDir(Some(dir.getAbsolutePath))
      Similarity.clearTrainingMemo()
      val a = Similarity.trainCentroids(vecs, 8, 500, 2)
      val (h0, w0) = Similarity.trainingDiskStats
      assert(h0 == 0 && w0 == 1,
        s"expected one disk write on first train, hits=$h0 writes=$w0")
      // a fresh JVM has an empty memory memo but finds the mirror —
      // this is the driver's Verify-then-Bench process pair
      Similarity.dropMemoryMemo()
      val b = Similarity.trainCentroids(
        SimilarityQueries.doubleVecs(spark, sf), 8, 500, 2)
      val (h1, w1) = Similarity.trainingDiskStats
      assert(h1 == 1 && w1 == 1,
        s"expected disk hit + no retrain write, hits=$h1 writes=$w1")
      assert(a.length == b.length &&
        a.zip(b).forall { case ((i1, v1), (i2, v2)) =>
          i1 == i2 && java.util.Arrays.equals(v1, v2) },
        "disk-mirrored artifact not bit-identical to the trained one")
      // torn/corrupt artifact ⇒ miss ⇒ retrain ⇒ rewrite
      val bins = dir.listFiles().filter(_.getName.endsWith(".bin"))
      assert(bins.length == 1)
      java.nio.file.Files.write(bins.head.toPath,
        Array[Byte](1, 2, 3)): Unit
      Similarity.dropMemoryMemo()
      val c = Similarity.trainCentroids(vecs, 8, 500, 2)
      val (h2, w2) = Similarity.trainingDiskStats
      assert(h2 == 1 && w2 == 2,
        s"corrupt file must retrain+rewrite, hits=$h2 writes=$w2")
      assert(a.zip(c).forall { case ((i1, v1), (i2, v2)) =>
        i1 == i2 && java.util.Arrays.equals(v1, v2) })
      Similarity.clearTrainingMemo() // wipes the temp mirror
      assert(dir.listFiles().forall(!_.getName.endsWith(".bin")))
    } finally {
      Similarity.setTrainingArtifactDir(saved)
      Similarity.dropMemoryMemo()
      dir.listFiles().foreach(_.delete())
      dir.delete(): Unit
    }
  }

  test("disk mirror hardening (ADVICE r13): a planted .bin holding a " +
      "non-allowlisted class is REJECTED by the deserialization filter " +
      "and degrades to a clean retrain; a store that cannot land is " +
      "not counted as a write; the mirror prunes oldest beyond the cap") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_train_filter_spec").toFile
    val saved = Similarity.trainingArtifactDir
    try {
      Similarity.setTrainingArtifactDir(Some(dir.getAbsolutePath))
      Similarity.clearTrainingMemo()
      val a = Similarity.trainCentroids(vecs, 8, 500, 2)
      val bins = dir.listFiles().filter(_.getName.endsWith(".bin"))
      assert(bins.length == 1)
      // overwrite the artifact with a serialized object OUTSIDE the
      // java.lang/scala allowlist. Without the ObjectInputFilter this
      // would deserialize fine and surface later as a ClassCastException
      // in the caller's .map (the erased cast can't catch it); with the
      // filter it must read as a MISS and retrain the identical value.
      val out = new java.io.ObjectOutputStream(
        new java.io.FileOutputStream(bins.head))
      try out.writeObject(new java.util.Date(0L)) finally out.close()
      Similarity.dropMemoryMemo()
      val (_, w0) = Similarity.trainingDiskStats
      val b = Similarity.trainCentroids(vecs, 8, 500, 2)
      val (_, w1) = Similarity.trainingDiskStats
      assert(w1 == w0 + 1,
        "rejected artifact must retrain and rewrite, not be served")
      assert(a.zip(b).forall { case ((i1, v1), (i2, v2)) =>
        i1 == i2 && java.util.Arrays.equals(v1, v2) })

      // write-counter honesty: point the mirror at a path whose parent
      // is a plain FILE — every store must fail, and the counter must
      // NOT claim a write that never landed
      val blocker = java.io.File.createTempFile("graft_not_a_dir", "")
      Similarity.setTrainingArtifactDir(
        Some(new java.io.File(blocker, "cache").getAbsolutePath))
      Similarity.clearTrainingMemo()
      Similarity.trainCentroids(vecs, 8, 500, 2): Unit
      val (h2, w2) = Similarity.trainingDiskStats
      assert(h2 == 0 && w2 == 0,
        s"store cannot land but was counted: hits=$h2 writes=$w2")
      blocker.delete(): Unit

      // pruning: plant stale .bin files well beyond the cap with old
      // mtimes; the next landed store keeps only the newest cap-many,
      // and the artifact just written survives
      Similarity.setTrainingArtifactDir(Some(dir.getAbsolutePath))
      Similarity.clearTrainingMemo()
      (0 until Similarity.DiskMirrorCap + 20).foreach { i =>
        val f = new java.io.File(dir, f"stale_$i%04d.bin")
        java.nio.file.Files.write(f.toPath, Array[Byte](0)): Unit
        f.setLastModified(1000000L + i * 1000L): Unit
      }
      Similarity.trainCentroids(vecs, 8, 500, 2): Unit
      val after = dir.listFiles().filter(_.getName.endsWith(".bin"))
      assert(after.length == Similarity.DiskMirrorCap,
        s"mirror not pruned to cap: ${after.length}")
      assert(after.exists(!_.getName.startsWith("stale_")),
        "pruning deleted the artifact it just stored")
      // evicted = the OLDEST planted files
      assert(!after.map(_.getName).contains("stale_0000.bin"))
    } finally {
      Similarity.setTrainingArtifactDir(saved)
      Similarity.clearTrainingMemo()
      Similarity.dropMemoryMemo()
      dir.listFiles().foreach(_.delete())
      dir.delete(): Unit
    }
  }

  test("deriveNlist holds cell population constant, floored and capped") {
    assert(Similarity.deriveNlist(500L) == 16)        // small-corpus floor
    assert(Similarity.deriveNlist(4096L) == 16)       // 4096/256 exactly
    assert(Similarity.deriveNlist(4097L) == 17)       // ceil division
    assert(Similarity.deriveNlist(50000L) == 196)     // sf1 scale: ∝ n
    assert(Similarity.deriveNlist(500000L) == 1024)   // capped
    // cell population stays ≤ TargetCellSize until the cap binds
    Seq(10000L, 100000L, 260000L).foreach { n =>
      val nl = Similarity.deriveNlist(n)
      assert(n / nl <= Similarity.TargetCellSize, s"cell too big at n=$n")
    }
  }

  test("trainCentroids derives nlist from the corpus when not given one") {
    val n = vecs.count()
    val want = math.min(Similarity.deriveNlist(n), n.toInt)
    assert(Similarity.trainCentroids(vecs).length == want)
  }

  test("IVF probes bound the scanned fraction of the corpus") {
    val queries = vecs.filter(col("vec_id") < 8)
    val top = Similarity.ivfTopK(vecs, queries, 1000, nlist = 16, nprobe = 2)
    // with 2 of 16 cells probed, each query sees roughly 1/8 of the
    // corpus; assert the candidate pool stays well under half
    val maxCands = top.groupBy("query_id").count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxCands < vecs.count() / 2,
      s"probing scanned too much: $maxCands candidates")
  }
}
