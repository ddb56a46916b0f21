package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

/** Contracts of the distilled quality filter the hash oracle can't
  * see: training is deterministic (same corpus → bit-identical
  * weights), the class weighting actually rescues the rare seed set
  * (precision lift over the base rate, non-degenerate keep set), and
  * the codegen'd scoring kernel agrees bitwise with a driver-side
  * replay of the same IEEE op sequence ((Σ x·w) + b).
  */
class ClassifierSpec extends SparkSpec {

  private def trainSet = SimilarityQueries.doubleVecs(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("features"),
      (col("label") === 0).cast("int").as("y"))

  test("training is deterministic and the seed class is learnable " +
       "above its base rate") {
    val (w1, b1) = LinearClassifier.train(trainSet)
    val (w2, b2) = LinearClassifier.train(trainSet)
    assert(w1.toSeq == w2.toSeq && b1 == b2,
      "two trainings on the same corpus diverged")

    // evaluate on the full (tiny) table: the filter must keep a
    // non-degenerate subset and find seeds at better than chance
    val scored = trainSet.select(col("id"), col("y"),
        LinearClassifier.score(col("features"), w1, b1).as("z"))
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val n = scored.length
    val base = scored.count(_._1 == 1).toDouble / n
    val kept = scored.filter(_._2 >= 0)
    assert(kept.nonEmpty && kept.length < n,
      s"degenerate filter: kept ${kept.length} of $n")
    val prec = kept.count(_._1 == 1).toDouble / kept.length
    val rec = kept.count(_._1 == 1).toDouble / scored.count(_._1 == 1)
    assert(prec >= 1.5 * base,
      s"no lift: precision $prec vs base rate $base")
    assert(rec >= 0.5, s"class weighting failed: seed recall $rec")
  }

  test("codegen'd score == a driver replay of the same op sequence") {
    val (w, b) = LinearClassifier.train(trainSet)
    val rows = trainSet.orderBy("id").limit(16)
      .select(col("features"),
        LinearClassifier.score(col("features"), w, b).as("z"))
      .collect()
    rows.foreach { r =>
      val x = r.getSeq[Double](0).toArray
      // same association as the Column: (Σ x·w) + b, dot from 0.0
      var dot = 0.0
      var j = 0
      while (j < x.length) { dot += x(j) * w(j); j += 1 }
      val z = dot + b
      assert(r.getDouble(1) == z,
        s"kernel score ${r.getDouble(1)} != driver $z")
    }
  }

  test("single-class training sample is rejected") {
    intercept[IllegalArgumentException] {
      LinearClassifier.train(trainSet.filter(col("y") === 0))
    }
  }
}
