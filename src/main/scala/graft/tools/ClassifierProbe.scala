package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quality-vs-scale probe for the distilled classifier
  * ([[graft.ml.LinearClassifier]]): the training sample is BOUNDED
  * (~8192 rows by deterministic hash selection) while the corpus it
  * filters grows without bound — the design bet is that a linear
  * seed-set boundary learned from a fixed-size sample keeps its
  * precision lift and seed recall at 100× the corpus. Two legs per
  * sf dir, each evaluated over the FULL corpus by one distributed
  * aggregate (the eval never collects):
  *
  *  - `natural`: the testdata's own label column. The synthetic
  *    labels carry (almost) no embedding signal, so this leg
  *    measures the honest failure mode — small-SF "lift" is
  *    in-sample memorization (the sample IS the corpus there) that
  *    decays toward 1.0 as the sample becomes a shrinking fraction.
  *    A real deployment must validate lift on HELD-OUT seed rows —
  *    exactly what this decay demonstrates.
  *  - `planted`: labels from a hidden hyperplane (sign of v·u for a
  *    fixed alternating-sign u, thresholded at the corpus's own 90th
  *    percentile, 5% deterministic label noise). Here signal exists,
  *    and the probe shows the bounded sample RECOVERS it at every
  *    scale — lift stays pinned near the noise ceiling as the corpus
  *    grows 40×. Together the legs separate "the sample is too
  *    small" (false) from "the labels have no signal" (true for the
  *    natural leg).
  *
  * Rows across sf dirs make the BASELINE.md lift-vs-SF table.
  *
  * Usage: runMain graft.tools.ClassifierProbe <sfDir> [label]
  */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val label = args.lift(1).getOrElse(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = graft.ops.SimilarityQueries.doubleVecs(spark, sfDir)
    val natural = vecs
      .select(col("vec_id").as("id"), col("embedding").as("features"),
        (col("label") === 0).cast("int").as("y"))
    val n = natural.count()
    // train()'s OWN bounded-sample arithmetic (shared helper, ADVICE
    // r8) — reported so the table shows the sample SHRINKING as a
    // corpus fraction (modulus widens past n = 8192·10⁶ rows)
    val (mod, num) =
      graft.ml.LinearClassifier.sampleSelection(math.max(1L, n), 8192)
    val nSample = natural
      .filter(pmod(xxhash64(col("id")), lit(mod)) < num).count()

    // hidden-hyperplane leg: u alternates ±1, threshold at the
    // corpus's own 90th percentile of v·u (positives ≈ base rate of
    // the natural leg), 5% of labels flipped by deterministic hash
    val u = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val s = org.apache.spark.sql.graft.Native
      .dot(col("features"), typedlit(u.toSeq))
    // min-of-top-k = the exact 90th-percentile cut. orderBy+limit
    // plans as TakeOrderedAndProject (per-partition heaps, driver
    // merge of k·partitions rows), not a full sort — fine at probe
    // scales (k = 20k at sf10) but NOT a 100 TB shape, hence the
    // fence: production derives thresholds from a bounded sample or
    // approxQuantile; this probe wants the exact deterministic cut
    // so its table reproduces bit-identically.
    val k = math.max(1L, n / 10)
    require(k <= 10000000L,
      s"planted-threshold top-k ($k) exceeds the probe's driver-merge " +
        "fence; use a sampled/approx threshold at this scale")
    val thr = natural.select(s.as("s")).orderBy(col("s").desc)
      .limit(k.toInt).agg(min(col("s"))).head().getDouble(0)
    val planted = natural.select(col("id"), col("features"),
      (((s >= thr).cast("int") +
        (pmod(xxhash64(col("id") + 7L), lit(20L)) === 0).cast("int"))
        % 2).as("y"))

    def leg(name: String,
            data: org.apache.spark.sql.DataFrame): String = {
      val t0 = System.nanoTime()
      val (w, b) = graft.ml.LinearClassifier.train(data)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val r = data.select(col("y"),
          (graft.ml.LinearClassifier.score(col("features"), w, b) >= 0)
            .cast("int").as("keep"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"),
          sum(col("keep")).as("nkeep"),
          sum(col("y") * col("keep")).as("nposkeep"))
        .head()
      val (nPos, nKeep, nPosKeep) =
        (r.getLong(1).toDouble, r.getLong(2).toDouble,
          r.getLong(3).toDouble)
      val base = nPos / n
      val prec = if (nKeep > 0) nPosKeep / nKeep else 0.0
      val rec = if (nPos > 0) nPosKeep / nPos else 0.0
      f""""$name":{"train_sec":$trainSec%.2f,"base_rate":$base%.4f,""" +
        f""""precision":$prec%.4f,"seed_recall":$rec%.4f,""" +
        f""""kept_frac":${nKeep / n}%.4f,""" +
        f""""lift":${if (base > 0) prec / base else 0.0}%.2f}"""
    }

    println(f"""{"probe":"$label","sf":"$sfDir","n_corpus":$n,""" +
      f""""n_sample":$nSample,""" + leg("natural", natural) + "," +
      leg("planted", planted) + "}")
    spark.stop()
  }
}
