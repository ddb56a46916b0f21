package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The auto-tuned nprobe policy (r9 verdict item 8): a deterministic
  * recall-target → nprobe function measured on the bounded training
  * sample — [[Similarity.nprobeRecallFrontier]] / [[Similarity.tuneNprobe]].
  */
class NprobeTuneSpec extends SparkSpec {

  private def vecs = graft.ops.SimilarityQueries.doubleVecs(spark, sf)

  test("frontier: monotone nondecreasing, exact-1.0 at nprobe=nlist, " +
       "and the CDF interpretation holds on a planted geometry") {
    // planted geometry: 4 orthogonal axis clusters in 8-d, centroids =
    // the axes. A point's true neighbors live in its own cluster, so
    // nprobe=1 must already reach recall 1.0.
    val cents = (0 until 4).map { j =>
      val v = new Array[Double](8); v(j) = 1.0; v
    }.toArray
    val pts = (0 until 64).map { i =>
      val v = new Array[Double](8)
      v(i % 4) = 1.0
      v(4 + i % 4) = 0.01 * (i / 4 + 1) // tiny in-cluster spread
      v
    }.toArray
    val frontier = Similarity.nprobeRecallFrontier(pts, cents,
      k = 3, nQueries = 16)
    assert(frontier.length === 4)
    assert(frontier.head._1 === 1 && frontier.last._1 === 4)
    // CDF: monotone nondecreasing, ends at 1.0
    frontier.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a <= b, s"frontier not monotone: $a > $b")
    }
    assert(frontier.last._2 === 1.0)
    // planted separability: one probed cell suffices
    assert(frontier.head._2 === 1.0,
      "axis-clustered points must reach full recall at nprobe=1")
  }

  test("tuneNprobe: minimal pick, deterministic, and ordered in the " +
       "target — a higher recall target can never pick a smaller nprobe") {
    val cents = Similarity.trainCentroids(vecs)
    val picks = Seq(0.25, 0.5, 0.8, 0.95, 1.0)
      .map(t => t -> Similarity.tuneNprobe(vecs, cents, t))
    picks.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a <= b, s"picks not ordered in target: $picks")
    }
    assert(picks.forall { case (_, np) =>
      np >= 1 && np <= cents.length })
    // determinism: the whole pipeline (hash sample → frontier → pick)
    // is a pure function of the corpus
    val again = Seq(0.25, 0.5, 0.8, 0.95, 1.0)
      .map(t => t -> Similarity.tuneNprobe(vecs, cents, t))
    assert(picks === again)
    // minimality: the pick's HELD-OUT frontier recall clears
    // target + margin and the setting below it does not (recompute
    // the frontier with the documented held-out-band arithmetic —
    // r12 bias correction: the tuner never measures itself on the
    // band the centroids trained on)
    val n = vecs.count()
    val pts = {
      val sN = Similarity.deriveSampleN(cents.length)
      val num = math.min(1000000L, math.max(1L, sN * 1000000L / n))
      val lo = math.min(num, 1000000L - num) // adjacent held-out band
      val band = pmod(xxhash64(col("vec_id")), lit(1000000L))
      vecs.filter(band >= lo && band < lo + num)
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
    }
    val frontier = Similarity.nprobeRecallFrontier(pts,
      cents.map(_._2)).toMap
    val m = math.min(32, pts.length) *
      math.min(5, math.max(0, pts.length - 1))
    picks.foreach { case (t, np) =>
      val need = math.min(1.0, t + Similarity.tuneMargin(t, m))
      assert(frontier(np) >= need,
        s"picked nprobe=$np misses corrected target $need: " +
          s"recall=${frontier(np)}")
      if (np > 1)
        assert(frontier(np - 1) < need,
          s"nprobe=${np - 1} already met corrected target $need " +
            "— pick not minimal")
    }
  }

  test("frontier property: for ANY deterministic point/centroid " +
       "geometry the frontier is a valid CDF and the pick is minimal") {
    // deterministic pseudo-random geometries (no RNG — seeds are the
    // loop indices): points on mixed scales, centroid counts from 2
    // to 16, dims 4 to 16; the CDF contract must hold for all of them
    for (seed <- 1 to 6) {
      val dim = 4 + (seed * 3) % 13
      val nlist = 2 + (seed * 5) % 15
      val n = 40 + seed * 17
      def vec(tag: Int, i: Int): Array[Double] =
        Array.tabulate(dim)(j =>
          (((tag * 2654435761L + i * 40503L + j * 97L) % 2048L) - 1024L)
            / 1024.0)
      val pts = Array.tabulate(n)(i => vec(seed, i))
      val cents = Array.tabulate(nlist)(c => vec(seed + 100, c))
      val k = 1 + seed % 4
      val f = Similarity.nprobeRecallFrontier(pts, cents, k,
        nQueries = 8)
      assert(f.length === nlist)
      assert(f.map(_._1).toSeq === (1 to nlist))
      f.sliding(2).foreach { case Array((_, a), (_, b)) =>
        assert(a <= b, s"seed=$seed frontier not monotone")
      }
      assert(f.last._2 === 1.0,
        s"seed=$seed probing every cell must recall everything")
      assert(f.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    }
  }

  test("the tuned pick buys the recall it promises on the actual " +
       "corpus probe (sample CDF ≈ corpus recall)") {
    // small-SF smoke of the Bench extras contract: probe the corpus at
    // the tuned setting and compare measured recall@5 to the target.
    // The sample IS the estimator — allow the usual estimation slack
    // (±0.15 at this tiny SF; BASELINE.md records the sf0.1 point).
    val cents = Similarity.trainCentroids(vecs)
    val tuned = Similarity.tuneNprobe(vecs, cents, recallTarget = 0.95)
    val probes = vecs.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(vecs, probes, 5)
      .select(col("query_id"), col("cand_id"))
    val nBrute = brute.count().toDouble
    val probed = Similarity.ivfTopK(vecs, probes, 5,
        nlist = cents.length, nprobe = tuned)
      .select(col("query_id"), col("cand_id"))
    val recall = probed.intersect(brute).count() / nBrute
    assert(recall >= 0.80,
      s"tuned nprobe=$tuned delivered corpus recall $recall " +
        "— sample estimate off by more than the allowed slack")
  }
}
