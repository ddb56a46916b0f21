package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.SimilarityQueries
import graft.sim.Similarity
import graft.text.Dedup

/** Self-maintaining streaming ingest (`maxSegments` on the family
  * stream sinks): the sink folds the segment chain via the family's
  * compaction whenever it exceeds the threshold, AFTER each append
  * commits. The oracles (driver gate) hash-verify the post-stream
  * probe answers; this spec pins the operational contract the oracle
  * can't see: the chain actually stays bounded however many batches
  * ran, folds really happened mid-stream, the probe equals the flat
  * recompute, and a checkpoint-replayed batch whose segment was FOLDED
  * still no-ops (the `_TAGS` carry through the maintenance fold).
  */
class MaintainedIngestSpec extends SparkSpec {

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fresh(root: String): Unit = {
    val fs = fsOf(root)
    if (fs.exists(new Path(root))) fs.delete(new Path(root), true)
  }

  private def chain(dir: String): Seq[String] =
    SegmentedIndex.segments(spark, dir,
      SegmentedIndex.currentVersion(spark, dir))

  private def streamIdOf(cp: String): String = {
    val json = PointerFile.read(fsOf(cp), new Path(s"$cp/metadata"))
    """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json).get.group(1)
  }

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what diverged")

  test("maintained shingle ingest: chain stays ≤ maxSegments through " +
       "4 micro-batches, probe ≡ flat rebuild, and a replayed batch " +
       "whose segment was folded still no-ops") {
    val root = "/tmp/graft_maintain_shingle_spec"
    fresh(root)
    val dir = s"$root/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val incoming = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Dedup.buildShingleIndex(docs.filter(col("doc_id") % 3 =!= 0), dir)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    delta.repartition(4).write.mode("overwrite").parquet(s"$root/in")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", 4)
    val q = s2.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .writeStream.option("checkpointLocation", s"$root/cp")
      .foreachBatch(Dedup.shingleStreamSink(dir, s"$root/cp",
        maxSegments = 2))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 4 batches over a base = 5 segments unmaintained; the threshold
    // keeps the committed chain bounded the whole run (the final state
    // can be 1 — a fold on the last batch — or 2)
    assert(chain(dir).size <= 2,
      s"maintained chain not bounded: ${chain(dir)}")
    // probe ≡ a flat rebuild of the full corpus
    val flatDir = s"$root/flat"
    Dedup.buildShingleIndex(docs, flatDir)
    assertSame(
      Dedup.probeShingleIndex(dir, incoming, k = 3, threshold = 0.8),
      Dedup.probeShingleIndex(flatDir, incoming, k = 3, threshold = 0.8),
      "maintained-ingest probe vs flat rebuild")
    // batch 0's segment was folded into a compacted base at least one
    // maintenance cycle ago; its tag must still absorb a replay
    val tag0 = s"${streamIdOf(s"$root/cp")}#0"
    val vBefore = SegmentedIndex.currentVersion(spark, dir)
    Dedup.appendShingleIndex(dir, delta.limit(3), tag = Some(tag0))
    assert(SegmentedIndex.currentVersion(spark, dir) == vBefore,
      "folded batch's tag did not absorb the replay")
    // an UNSEEN tag still appends (the maintenance fold must not have
    // poisoned the namespace)
    Dedup.appendShingleIndex(dir, delta.limit(3)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text")),
      tag = Some("fresh#99"))
    assert(SegmentedIndex.currentVersion(spark, dir) != vBefore,
      "fresh tagged append was wrongly absorbed")
  }

  test("maintained IVF ingest: chain bounded, probe ≡ unmaintained " +
       "ingest of the same delta, folds leave one file per cell") {
    val root = "/tmp/graft_maintain_ivf_spec"
    fresh(root)
    val dir = s"$root/index"
    val vecs = SimilarityQueries.doubleVecs(spark, sf)
    val base = vecs.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val delta = vecs.filter(pmod(col("vec_id"), lit(3)) === 0)
    Similarity.buildIvfIndex(base, dir, nlist = 8)
    delta.repartition(4).write.mode("overwrite").parquet(s"$root/in")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", 4)
    val q = s2.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .writeStream.option("checkpointLocation", s"$root/cp")
      .foreachBatch(Similarity.ivfStreamSink(dir, s"$root/cp",
        maxSegments = 2))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(chain(dir).size <= 2,
      s"maintained chain not bounded: ${chain(dir)}")
    // fold-invariance: the probe must equal the direct assignment
    // replay of the FULL corpus against the maintained index's frozen
    // centroids — the same contract every other ingest path pins
    val queries = vecs.filter(col("vec_id") < 8)
    val cents = Similarity.readCentroids(spark, dir,
      Similarity.indexVersion(spark, dir))
    val direct = Similarity.ivfTopK(vecs, queries, 5,
      centroids = Some(cents))
    assertSame(Similarity.ivfProbeIndexed(dir, queries, 5), direct,
      "maintained-ingest probe vs direct assignment replay")
    // if the last batch triggered a fold, the base is compacted: every
    // occupied cell dir holds exactly one file
    val ch = chain(dir)
    if (ch.size == 1) {
      val fs = fsOf(dir)
      fs.listStatus(new Path(s"$dir/${ch.head}/cells"))
        .filter(_.getPath.getName.startsWith("centroid_id="))
        .foreach { cell =>
          val it = fs.listFiles(cell.getPath, true)
          var n = 0
          while (it.hasNext) {
            if (it.next().getPath.getName.endsWith(".parquet")) n += 1
          }
          assert(n == 1,
            s"${cell.getPath.getName}: $n files after maintenance fold")
        }
    }
  }
}
