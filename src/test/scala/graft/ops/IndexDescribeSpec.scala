package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Similarity
import graft.sources.Tables
import graft.text.Dedup

/** The describe verb's contracts the DuckDB oracle can't see: the
  * numbers survive COMPACTION (same totals, one segment — describe is
  * a view of the chain, not of how it got folded), and the IVF
  * histogram is computed from the hive partition column alone (the
  * cells scan must read NO data columns — describe cost is metadata,
  * not corpus).
  */
class IndexDescribeSpec extends SparkSpec {

  private def fresh(root: String): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  test("shingle describe: totals are compaction-invariant, distinct " +
       "shingles merge across segments") {
    val root = "/tmp/graft_describe_spec_sh"
    fresh(root)
    val dir = s"$root/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Dedup.buildShingleIndex(docs.filter(col("doc_id") % 3 =!= 0), dir)
    Dedup.appendShingleIndex(dir, docs.filter(col("doc_id") % 3 === 0))
    val before = Dedup.describeShingleIndex(spark, dir)
      .orderBy("seg_ord").collect()
    assert(before.length == 2, s"expected base+delta, got $before")
    Dedup.compactShingleIndex(spark, dir)
    val after = Dedup.describeShingleIndex(spark, dir).collect()
    assert(after.length == 1, "compacted index must describe as 1 segment")
    def tot(rows: Array[org.apache.spark.sql.Row], c: String) =
      rows.map(_.getAs[Long](c)).sum
    // docs and postings are per-doc populations: exact sums
    assert(tot(after, "n_docs") == tot(before, "n_docs"))
    assert(tot(after, "n_postings") == tot(before, "n_postings"))
    // distinct shingles MERGE: folded count can only be <= the
    // per-segment sum, and >= either side's count alone
    assert(tot(after, "n_shingles") <= tot(before, "n_shingles"))
    assert(tot(after, "n_shingles") >=
      before.map(_.getAs[Long]("n_shingles")).max)
    assert(after.head.getAs[Long]("min_doc") ==
      before.map(_.getAs[Long]("min_doc")).min)
    assert(after.head.getAs[Long]("max_doc") ==
      before.map(_.getAs[Long]("max_doc")).max)
  }

  test("ivf describe: histogram is compaction-invariant and the cells " +
       "scan reads no data columns") {
    val root = "/tmp/graft_describe_spec_ivf"
    fresh(root)
    val dir = s"$root/index"
    val vecs = SimilarityQueries.doubleVecs(spark, sf)
    Similarity.buildIvfIndex(
      vecs.filter(pmod(col("vec_id"), lit(3)) =!= 0), dir, nlist = 8)
    Similarity.appendIvfIndex(dir,
      vecs.filter(pmod(col("vec_id"), lit(3)) === 0))
    val desc = Similarity.describeIvfIndex(spark, dir)
    // metadata-only claim: after column pruning the parquet scan of
    // cells requests an EMPTY read schema — the count aggregates over
    // the hive partition column alone
    val plan = desc.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<>"),
      s"cells scan reads data columns:\n$plan")
    val perCell = desc.groupBy("centroid_id")
      .agg(sum("n_vecs").as("n")).orderBy("centroid_id").collect()
    Similarity.compactIvfIndex(spark, dir)
    val folded = Similarity.describeIvfIndex(spark, dir)
    assert(folded.select("seg_ord").distinct().count() == 1)
    val perCellAfter = folded.groupBy("centroid_id")
      .agg(sum("n_vecs").as("n")).orderBy("centroid_id").collect()
    assert(perCell.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      perCellAfter.map(r => (r.getInt(0), r.getLong(1))).toSeq,
      "per-cell histogram changed across compaction")
  }
}
