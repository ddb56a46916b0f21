package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** df-cap-vs-REAL-skew probe (VERDICT r6 item 5): GenScale's replicas
  * are decorrelated, so the standing-index df-cap had nothing to drop
  * and its sf10 measurement priced only overhead. This plants the
  * skew the cap exists for — one boilerplate header (≈a dozen
  * shingles) carried by EVERY corpus document, the license-header /
  * nav-chrome shape of a real crawl — builds the standing index over
  * the skewed corpus, and probes it with a boilerplate-carrying shard
  * twice: uncapped and df-capped (maxPostings=100).
  *
  * The candidate volume is also computed ANALYTICALLY from the
  * index's own dfreq table (Σ over probed shingles of df_index ×
  * df_shard — exactly the pair-join's pre-aggregation row count), so
  * the blowup the cap removes is stated in rows, not just seconds.
  *
  * Usage: runMain graft.tools.SkewProbe <sfDir> [label] [shardN]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf1")
    val label = args.lift(1).getOrElse(sfDir)
    val shardN = args.lift(2).map(_.toInt).getOrElse(300)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val boiler = "standard header terms of use all rights reserved " +
      "redistribution permitted under license"
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(lit(boiler + " "), col("text")).as("text"))
    val n = docs.count()
    val shard = docs.filter(col("doc_id") % 7 === 0
        && col("doc_id") < lit(shardN * 7L))
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val nShard = shard.count()

    val dir = s"/tmp/graft_skewprobe_${label.hashCode.abs}"
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    val t0 = System.nanoTime()
    graft.text.Dedup.buildShingleIndex(docs, dir)
    val buildSec = (System.nanoTime() - t0) / 1e9

    // analytic candidate volume from the index's own dfreq table:
    // Σ_s df_index(s) · df_shard(s), capped vs not
    val version = graft.sources.PointerFile.read(
      new org.apache.hadoop.fs.Path(dir, "_CURRENT").getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(dir, "_CURRENT"))
    val dfreq = spark.read.parquet(s"$dir/$version/dfreq")
    val shardDf = graft.text.Dedup.hashedShingleSet(shard, 3)
      .groupBy("shingle").agg(count(lit(1)).as("sdf"))
    val vols = dfreq.join(shardDf, Seq("shingle"))
      .agg(sum(col("df") * col("sdf")).as("uncapped"),
        sum(when(col("df") <= 100, col("df") * col("sdf"))
          .otherwise(0L)).as("capped"))
      .head()
    val (volUncapped, volCapped) = (vols.getLong(0), vols.getLong(1))

    def probeOnce(maxPostings: Int): (Double, Long) = {
      val t = System.nanoTime()
      val cnt = graft.text.Dedup.probeShingleIndex(dir, shard, k = 3,
        threshold = 0.8, maxPostings = maxPostings).count()
      ((System.nanoTime() - t) / 1e9, cnt)
    }
    val (tCap1, pairsCapped) = probeOnce(100)
    val (tCap2, _) = probeOnce(100)
    val (tRaw1, pairsUncapped) = probeOnce(Int.MaxValue)
    val (tRaw2, _) = probeOnce(Int.MaxValue)

    println(f"""{"probe":"$label","sf":"$sfDir","n_docs":$n,""" +
      f""""n_shard":$nShard,"build_sec":$buildSec%.2f,""" +
      f""""cand_uncapped":$volUncapped,"cand_capped":$volCapped,""" +
      f""""probe_uncapped_sec":${math.min(tRaw1, tRaw2)}%.2f,""" +
      f""""probe_capped_sec":${math.min(tCap1, tCap2)}%.2f,""" +
      f""""pairs_uncapped":$pairsUncapped,""" +
      f""""pairs_capped":$pairsCapped}""")
    spark.stop()
  }
}
