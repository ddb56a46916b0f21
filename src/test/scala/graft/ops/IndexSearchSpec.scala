package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables
import graft.text.Dedup

/** The search verb's contracts the single-phrase DuckDB oracle can't
  * see: completeness against the brute-force corpus grep for MANY
  * needles (including one whose match set lives in the APPENDED
  * segment, and one absent from the corpus), and the scale shape —
  * the postings scan carries a pushed IN filter on the shingle
  * hashes, and the candidate verify rides a broadcast, never a
  * shuffle of the documents table.
  */
class IndexSearchSpec extends SparkSpec {

  private def fresh(root: String): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  test("index search == brute-force grep for corpus-drawn phrases, " +
       "empty for an absent phrase, pushed IN + broadcast verify") {
    val root = "/tmp/graft_search_spec"
    fresh(root)
    val dir = s"$root/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Dedup.buildShingleIndex(docs.filter(col("doc_id") % 3 =!= 0), dir)
    Dedup.appendShingleIndex(dir, docs.filter(col("doc_id") % 3 === 0))

    // needles drawn from base-segment docs, append-segment docs, and
    // different offsets — the match sets must equal the full grep's
    val seeds = docs.filter(size(split(col("text"), " ")) >= 10)
      .orderBy("doc_id")
    val fromBase = seeds.filter(col("doc_id") % 3 =!= 0)
      .limit(1).head().getString(1)
    val fromDelta = seeds.filter(col("doc_id") % 3 === 0)
      .limit(1).head().getString(1)
    val phrases = Seq(
      fromBase.split(" ").slice(0, 4).mkString(" "),
      fromBase.split(" ").slice(3, 9).mkString(" "),
      fromDelta.split(" ").slice(1, 6).mkString(" "))
    phrases.foreach { phrase =>
      val got = Dedup.searchShingleIndex(spark, dir, phrase, docs)
        .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      val want = docs.filter(
          instr(concat(lit(" "), col("text"), lit(" ")),
            lit(s" $phrase ")) > 0)
        .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(got == want, s"phrase '$phrase': index search diverged")
      assert(want.nonEmpty, s"phrase '$phrase': degenerate fixture")
    }

    // a phrase of tokens that cannot exist in the synthetic corpus
    val absent = Dedup.searchShingleIndex(spark, dir,
      "qqqqxz wwwwxz zzzzxq", docs)
    assert(absent.count() == 0)

    // scale shape: IN on the shingle hashes reaches the parquet scan;
    // the verify join broadcasts the candidate set
    val q = Dedup.searchShingleIndex(spark, dir, phrases.head, docs)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(shingle"),
      s"postings scan lost the pushed IN filter:\n$plan")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"candidate verify is not a broadcast semi join:\n$plan")
  }
}
