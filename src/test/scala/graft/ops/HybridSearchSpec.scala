package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Similarity
import graft.sources.Tables
import graft.text.Dedup

/** Hybrid-retrieval contracts the hash oracle can't see: the fused
  * ranking is exactly the RRF arithmetic over the two legs' ranks
  * (recomputed here from the same standing indexes), every emitted
  * doc appears in at least one leg's top-20, and the scores come out
  * fused-descending. The per-leg read paths themselves (probe ≡
  * recompute, pruned cell scans) are pinned by DedupSpec /
  * IvfIndexSpec; this spec pins the COMPOSITION.
  */
class HybridSearchSpec extends SparkSpec {

  test("rrf fusion == hand-fused legs from the same standing indexes") {
    val root = "/tmp/graft_hybrid_spec"
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)

    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val vecs = SimilarityQueries.doubleVecs(spark, sf)
    Dedup.buildShingleIndex(docs, s"$root/shingle")
    Similarity.buildIvfIndex(vecs, s"$root/ivf")
    val qid = docs.filter(size(split(col("text"), " ")) >= 8)
      .agg(min("doc_id")).head().getLong(0)

    // the query under test
    val fused = graft.SparkEntry.queries("sim_hybrid_search")(spark, sf)
      .collect()
    assert(fused.length == 10, s"expected top-10, got ${fused.length}")

    // recompute both legs directly off the same standing artifacts
    val lex = Dedup.probeShingleIndex(s"$root/shingle",
        docs.filter(col("doc_id") === qid), threshold = 0.0)
      .filter(col("a_id") =!= qid)
      .orderBy(col("jaccard").desc, col("a_id"))
      .limit(20).collect()
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1) }.toMap
    val sem = Similarity.ivfProbeIndexed(s"$root/ivf",
        vecs.filter(col("vec_id") === qid), 20)
      .collect().map(r => r.getLong(2) -> r.getInt(1)).toMap

    fused.foreach { row =>
      val id = row.getLong(0)
      val rLex = lex.get(id)
      val rSem = sem.get(id)
      assert(rLex.isDefined || rSem.isDefined,
        s"doc $id emitted but in neither leg's top-20")
      val want = rLex.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rSem.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(row.getDouble(3) == want,
        s"doc $id rrf ${row.getDouble(3)} != $want " +
          s"(r_lex=$rLex r_sem=$rSem)")
      assert(Option(row.get(1)).map(_.asInstanceOf[Int]) == rLex &&
        Option(row.get(2)).map(_.asInstanceOf[Int]) == rSem,
        s"doc $id emitted ranks disagree with the legs")
    }
    // fused-descending with the id tiebreak
    val scores = fused.map(r => (r.getDouble(3), r.getLong(0)))
    assert(scores.sliding(2).forall { case Array((s1, i1), (s2, i2)) =>
      s1 > s2 || (s1 == s2 && i1 < i2) },
      s"fusion order broken: ${scores.toSeq}")
  }
}
