package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

/** Contracts of the intra-corpus SemDeDup primitive and the distill
  * build that composes it — the parts the hash oracle can't see:
  * the keep-min-id drop rule (every dropped row really has a
  * smaller-id same-cell near-dup; survivors are pairwise clean so a
  * second pass is empty), the planted families actually exercising
  * stages 2 and 3 of pipeline_distill_build, and the scale shape
  * (eval side broadcast, pair joins cell-blocked — no cartesian).
  */
class SemDedupSpec extends SparkSpec {

  private lazy val vecs = SimilarityQueries.doubleVecs(spark, sf)
  private lazy val cents = Similarity.trainCentroids(vecs)

  test("dropped ids each have a smaller-id same-cell near-dup, and " +
       "the survivor set re-runs to empty") {
    // plant a near-dup for every 20th vector so drops exist at all
    val planted = vecs.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.05)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = vecs.select("vec_id", "embedding").unionByName(planted)
    val drops = Similarity.semDedupDropIds(corpus, cents, tau = 0.995)
    val dropped = drops.collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "no near-dups dropped despite planting")
    // keep-min: a planted copy (id+100000) always outranks its source,
    // so drops should be dominated by planted ids — a genuine-id drop
    // means the corpus itself had a real near-dup pair (allowed)
    assert(dropped.exists(_ >= 100000L),
      "no planted copy was dropped — keep-min rule broken")
    val survivors = corpus.join(drops, Seq("vec_id"), "left_anti")
    val second = Similarity.semDedupDropIds(survivors, cents, tau = 0.995)
    assert(second.count() === 0L,
      "survivor set is not pairwise clean — second pass found drops")
  }

  test("distill build: both planted families are non-vacuous — " +
       "stage 2 catches leaks, stage 3 catches dups") {
    val (w, b) = graft.ml.LinearClassifier.train(
      vecs.select(col("vec_id").as("id"),
        col("embedding").as("features"),
        (col("label") === 0).cast("int").as("y")),
      idCol = "id", featCol = "features", yCol = "y")
    val maxId = vecs.agg(max(col("vec_id"))).head.getLong(0)
    val off = math.max(200000L, maxId + 1)
    def perturb(df: org.apache.spark.sql.DataFrame, shift: Long) =
      df.select((col("vec_id") + shift).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.05)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val evalSet = vecs.filter(col("vec_id") % 10 === 0)
      .select("vec_id", "embedding")
    val build = vecs.filter(col("vec_id") % 10 =!= 0)
      .select("vec_id", "embedding")
      .unionByName(perturb(vecs.filter(col("vec_id") % 20 === 0), off))
      .unionByName(perturb(vecs.filter(col("vec_id") % 20 === 5), 2 * off))
    val kept = build.filter(
      graft.ml.LinearClassifier.score(col("embedding"), w, b) >= 0)
    val leaks = Similarity.semanticMatchedIds(kept, evalSet, cents,
        tau = 0.99).collect().map(_.getLong(0)).toSet
    val clean = kept.filter(!col("vec_id").isInCollection(leaks))
    val dups = Similarity.semDedupDropIds(clean, cents, tau = 0.995)
      .collect().map(_.getLong(0)).toSet
    // planted leak copies that the classifier kept must be flagged by
    // SOME stage (leak catch, or — if the copy's cell probe missed —
    // possibly nothing: cell-boundary escapes are the documented
    // trade). Require the common case: a majority are caught.
    val keptPlantedLeaks = kept
      .filter(col("vec_id") >= off && col("vec_id") < 2 * off)
      .collect().map(_.getLong(0)).toSet
    if (keptPlantedLeaks.nonEmpty) {
      val caught = keptPlantedLeaks.count(leaks.contains)
      assert(caught * 2 >= keptPlantedLeaks.size,
        s"stage 2 caught only $caught/${keptPlantedLeaks.size} leaks")
    }
    assert(leaks.nonEmpty, "stage 2 (decontamination) was vacuous")
    assert(dups.nonEmpty, "stage 3 (semantic dedup) was vacuous")
    // dup drops include planted +2·off copies (copy outranks source)
    assert(dups.exists(_ >= 2 * off),
      "no planted near-dup copy was dropped by stage 3")
  }

  test("scale shape: eval probe broadcasts, pair join is cell-blocked") {
    val plan = Similarity.semanticMatchedIds(
      vecs.filter(col("vec_id") % 10 =!= 0), vecs.filter(col("vec_id") % 10 === 0),
      cents, tau = 0.99).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val dplan = Similarity.semDedupDropIds(vecs, cents, tau = 0.995)
      .queryExecution.executedPlan.toString
    assert(!dplan.contains("CartesianProduct"),
      "semDedup pair join degenerated to a cartesian product")
    assert(dplan.contains("centroid_id"),
      "semDedup pair join is not blocked on the cell id")
  }
}
