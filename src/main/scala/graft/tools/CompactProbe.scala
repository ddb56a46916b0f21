package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.sources.Tables
import graft.text.Dedup

/** Measures the claim compaction exists for: probe latency against a
  * standing index grows with SEGMENT COUNT (per-segment fixed cost —
  * one bucketed join / one pruned file set per segment), not data
  * volume, and compaction restores the fresh-build probe time.
  *
  * Protocol per family: build on 1/2 the corpus, append the other
  * half in N equal deltas (chain = N+1 segments), probe warm (min of
  * 3) at the segmented chain, COMPACT, probe warm again — same data,
  * same answer (asserted), segments N+1 → 1. Also reports the
  * compaction wall time and file counts, since "compact is cheap and
  * probes get fast again" is the whole trade.
  *
  *   runMain graft.tools.CompactProbe [sfDir] [nAppends]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nApp = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def warmMin3(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); rows = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    def nFiles(path: String): Int = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true); var n = 0
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        }
        n
      }
    }
    def chainFiles(dir: String, sub: String): Int = {
      val cur = graft.sources.SegmentedIndex.currentVersion(spark, dir)
      graft.sources.SegmentedIndex.segments(spark, dir, cur)
        .map(v => nFiles(s"$dir/$v/$sub")).sum
    }

    // ---- shingle family ----
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val shard = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val shDir = "/tmp/graft_compact_probe_shingle"
    val fs0 = new org.apache.hadoop.fs.Path(shDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.delete(new org.apache.hadoop.fs.Path(shDir), true)
    Dedup.buildShingleIndex(docs.filter(col("doc_id") % 2 === 0), shDir)
    (0 until nApp).foreach { i =>
      Dedup.appendShingleIndex(shDir, docs.filter(
        col("doc_id") % 2 === 1 && pmod(col("doc_id"), lit(2 * nApp))
          === (2 * i + 1)))
    }
    val (tSeg, nSeg) = warmMin3(() =>
      Dedup.probeShingleIndex(shDir, shard, 3, 0.8).count())
    val filesSeg = chainFiles(shDir, "postings")
    val t0 = System.nanoTime()
    Dedup.compactShingleIndex(spark, shDir)
    val tCompact = (System.nanoTime() - t0) / 1e9
    val (tOne, nOne) = warmMin3(() =>
      Dedup.probeShingleIndex(shDir, shard, 3, 0.8).count())
    val filesOne = chainFiles(shDir, "postings")
    require(nSeg == nOne, s"probe answer changed: $nSeg -> $nOne")
    println(f"[shingle] probe @${nApp + 1} segments $tSeg%6.2f s " +
      f"($filesSeg files) -> compacted $tOne%6.2f s ($filesOne files); " +
      f"compact cost $tCompact%6.2f s; pairs $nSeg")

    // ---- IVF raw family ----
    val vecs = graft.ops.SimilarityQueries.doubleVecs(spark, sfDir)
      .localCheckpoint()
    val q = vecs.filter(col("vec_id") < 8).localCheckpoint()
    val ivfDir = "/tmp/graft_compact_probe_ivf"
    fs0.delete(new org.apache.hadoop.fs.Path(ivfDir), true)
    Similarity.buildIvfIndex(vecs.filter(col("vec_id") % 2 === 0), ivfDir)
    (0 until nApp).foreach { i =>
      Similarity.appendIvfIndex(ivfDir, vecs.filter(
        col("vec_id") % 2 === 1 && pmod(col("vec_id"), lit(2 * nApp))
          === (2 * i + 1)))
    }
    val (vSeg, rSeg) = warmMin3(() =>
      Similarity.ivfProbeIndexed(ivfDir, q, 5).count())
    val cellsSeg = chainFiles(ivfDir, "cells")
    val t1 = System.nanoTime()
    Similarity.compactIvfIndex(spark, ivfDir)
    val vCompact = (System.nanoTime() - t1) / 1e9
    val (vOne, rOne) = warmMin3(() =>
      Similarity.ivfProbeIndexed(ivfDir, q, 5).count())
    val cellsOne = chainFiles(ivfDir, "cells")
    require(rSeg == rOne, s"probe answer changed: $rSeg -> $rOne")
    println(f"[ivf]     probe @${nApp + 1} segments $vSeg%6.2f s " +
      f"($cellsSeg files) -> compacted $vOne%6.2f s ($cellsOne files); " +
      f"compact cost $vCompact%6.2f s; rows $rSeg")
    spark.stop()
  }
}
