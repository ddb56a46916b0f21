package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

/** IVF-PQ mechanical contracts: the oracle (driver gate) hash-verifies
  * the encode→prune→ADC-rank values; this spec pins what the oracle
  * can't see — the on-disk compression the index exists for, the
  * pruned read path, code-range/determinism of training, and dup
  * retrieval through the quantizer.
  */
class IvfPqSpec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)
  private val dir = "/tmp/graft_ivf_pq_spec"
  private val rawDir = "/tmp/graft_ivf_pq_spec_raw"

  private def treeBytes(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  test("PQ codes: m per row, every code in [0, ksub); training is " +
       "bit-deterministic") {
    val books = Similarity.trainPqBooks(vecs, m = 4, ksub = 16)
    assert(books.length == 4 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 16))) // 64 dims / 4 subspaces
    val again = Similarity.trainPqBooks(vecs, m = 4, ksub = 16)
    assert(books.zip(again).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) }
    }, "PQ training is not deterministic")
    val codes = vecs.select(
      Similarity.pqCodes(col("embedding"), books).as("codes"))
    val stats = codes.select(
      min(size(col("codes"))).as("mn"), max(size(col("codes"))).as("mx"),
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi")).head()
    assert(stats.getInt(0) == 4 && stats.getInt(1) == 4)
    assert(stats.getInt(2) >= 0 && stats.getInt(3) < 16,
      s"code out of range: $stats")
  }

  test("the persisted PQ cells hold codes only and are measurably " +
       "smaller than the raw-vector cells") {
    Similarity.buildIvfPqIndex(vecs, dir, nlist = 16)
    Similarity.buildIvfIndex(vecs, rawDir, nlist = 16)
    val ver = Similarity.indexVersion(spark, dir)
    val cells = spark.read.parquet(s"$dir/$ver/cells")
    assert(cells.columns.toSet == Set("cand_id", "codes", "centroid_id"),
      s"PQ cells must not carry raw vectors: ${cells.columns.mkString(",")}")
    val rawVer = Similarity.indexVersion(spark, rawDir)
    val pqBytes = treeBytes(s"$dir/$ver/cells")
    val rawBytes = treeBytes(s"$rawDir/$rawVer/cells")
    // 500 vecs × (4 small ints vs 64 doubles): parquet overhead damps
    // the raw ~60× payload ratio, but the direction must be decisive
    assert(pqBytes * 3 < rawBytes,
      s"PQ cells $pqBytes B not < 1/3 of raw cells $rawBytes B")
  }

  test("the PQ probe scan is partition-pruned and reads no vector " +
       "column") {
    Similarity.buildIvfPqIndex(vecs, dir, nlist = 16)
    val probe = Similarity.ivfPqProbeIndexed(dir,
      vecs.filter(col("vec_id") < 8), 5, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("cells") && l.contains("PartitionFilters"))
      .getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[.*centroid_id.*\\].*"),
      s"no partition filter on the PQ cells scan:\n$plan")
    assert(!plan.contains("c_vec") && !scanLine.contains("embedding"),
      "PQ probe should never read a raw vector column from the index")
    assert(probe.count() > 0)
  }

  test("append: delta encodes with the FROZEN codebooks into its own " +
       "segment; tagged replay and empty deltas commit nothing") {
    val dir2 = "/tmp/graft_ivf_pq_append_spec"
    val p = new org.apache.hadoop.fs.Path(dir2)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(p)) fsys.delete(p, true)
    val base = vecs.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val delta = vecs.filter(pmod(col("vec_id"), lit(3)) === 0)
    Similarity.buildIvfPqIndex(base, dir2, nlist = 16)
    Similarity.appendIvfPqIndex(dir2, delta, tag = Some("b0"))
    val ver = Similarity.indexVersion(spark, dir2)
    val segs = Similarity.indexSegments(spark, dir2, ver)
    assert(segs.size == 2, s"expected base+delta segments: $segs")
    // the delta segment's stored codes == re-encoding the delta with
    // the CURRENT (frozen, copied-forward) codebooks
    val books = Similarity.readCodebooks(spark, dir2, ver)
    val stored = spark.read.parquet(s"$dir2/${segs.last}/cells")
      .select(col("cand_id"), col("codes"))
    val expected = delta.select(col("vec_id").as("cand_id"),
      Similarity.pqCodes(col("embedding"), books).as("codes"))
    assert(stored.exceptAll(expected).isEmpty &&
      expected.exceptAll(stored).isEmpty,
      "delta codes diverge from frozen-codebook encoding")
    // probing the appended index surfaces delta candidates too
    val cand = Similarity.ivfPqProbeIndexed(dir2,
      vecs.filter(col("vec_id") < 8), 5)
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(cand.exists(_ % 3 == 0), s"no delta candidate in $cand")
    // exactly-once + quiet ticks
    def nVersions = fsys.listStatus(p)
      .count(st => st.isDirectory && st.getPath.getName.startsWith("v-"))
    val before = nVersions
    Similarity.appendIvfPqIndex(dir2, delta, tag = Some("b0"))
    assert(nVersions == before, "replayed tagged append committed")
    Similarity.appendIvfPqIndex(dir2, delta.filter(lit(false)))
    assert(nVersions == before, "empty append committed a segment")
  }

  test("refined probe: candidates come only from the ADC retrieve " +
       "set, scores are exact cosine, and recall never drops below " +
       "the unrefined probe's") {
    Similarity.buildIvfPqIndex(vecs, dir, nlist = 16)
    val probes = vecs.filter(col("vec_id") < 8)
    val adc20 = Similarity.ivfPqProbeIndexed(dir, probes, 20)
      .select(col("query_id"), col("cand_id"))
    val refined = Similarity.ivfPqProbeRefined(dir, vecs, probes, 5,
      refine = 4)
    // containment: the re-rank may only reorder the ADC top-20
    assert(refined.select(col("query_id"), col("cand_id"))
      .exceptAll(adc20).isEmpty,
      "refined surfaced a candidate outside the ADC retrieve set")
    // exactness: every refined score equals the brute-force cosine
    // for that (query, cand) pair — quantization error is gone
    val brute = Similarity.bruteForceTopK(vecs, probes, vecs.count().toInt)
      .select(col("query_id"), col("cand_id"), col("cosine"))
    assert(refined.select(col("query_id"), col("cand_id"), col("cosine"))
      .exceptAll(brute).isEmpty,
      "refined cosine diverges from the exact pairwise score")
    // monotonicity on the planted geometry: refined top-5 hits at
    // least as many true neighbors as ADC top-5
    val bruteTop = Similarity.bruteForceTopK(vecs, probes, 5)
      .select(col("query_id"), col("cand_id"))
    val adcHits = Similarity.ivfPqProbeIndexed(dir, probes, 5)
      .select(col("query_id"), col("cand_id"))
      .intersect(bruteTop).count()
    val refHits = refined.select(col("query_id"), col("cand_id"))
      .intersect(bruteTop).count()
    assert(refHits >= adcHits,
      s"refined recall $refHits < unrefined $adcHits")
  }

  test("an exact duplicate survives quantization: same codes, found " +
       "at rank 1") {
    val dup = vecs.filter(col("vec_id") === 3)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"),
        col("label"))
    val corpus = vecs.unionByName(dup)
    Similarity.buildIvfPqIndex(corpus, dir, nlist = 16)
    val ver = Similarity.indexVersion(spark, dir)
    val books = Similarity.readCodebooks(spark, dir, ver)
    // identical vectors encode to identical codes (pure function)
    val codes = corpus.filter(col("vec_id").isin(3L, 1003L))
      .select(Similarity.pqCodes(col("embedding"), books).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes(0) == codes(1), s"dup codes differ: ${codes.toSeq}")
    // and the dup's reconstruction ties the query's own cell-best,
    // so it surfaces at rank 1 (cand-id tiebreak: 1003 loses only to
    // same-coded candidates with lower ids — none here)
    val top = Similarity.ivfPqProbeIndexed(dir,
      corpus.filter(col("vec_id") === 3), 1)
      .select("cand_id").head().getLong(0)
    assert(top == 1003L, s"exact duplicate not at rank 1 (got $top)")
  }

  test("streaming ingest runs multiple micro-batches and converges " +
       "to the flat-append index") {
    SimilarityQueries.queries
      .find(_.name == "sim_stream_pq_ingest").get.fn(spark, sf).count()
    // per-pid scratch root (QueryPack.scratch), not the stale pre-r12
    // fixed /tmp path
    val sdir = graft.ops.QueryPack.scratch("pq_stream", sf) + "/index"
    val ver = Similarity.indexVersion(spark, sdir)
    val segs = Similarity.indexSegments(spark, sdir, ver)
    assert(segs.size >= 3,
      s"expected base + >=2 streamed segments, got $segs")
    // streamed segments carry codes bit-identical to a flat append's:
    // the flat twin builds on the SAME base split, training is
    // bit-deterministic (pinned above), so centroids and codebooks
    // match and the full stored (id, codes) sets must be equal
    val flatDir = "/tmp/graft_pq_stream_flat_spec"
    val p = new org.apache.hadoop.fs.Path(flatDir)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(p)) fsys.delete(p, true)
    Similarity.buildIvfPqIndex(
      vecs.filter(pmod(col("vec_id"), lit(3)) =!= 0), flatDir)
    Similarity.appendIvfPqIndex(flatDir,
      vecs.filter(pmod(col("vec_id"), lit(3)) === 0))
    val streamedCodes = segs.map(s =>
        spark.read.parquet(s"$sdir/$s/cells"))
      .reduce(_ unionByName _).select("cand_id", "codes")
    val flatVer = Similarity.indexVersion(spark, flatDir)
    val flatCodes = Similarity.indexSegments(spark, flatDir, flatVer)
      .map(s => spark.read.parquet(s"$flatDir/$s/cells"))
      .reduce(_ unionByName _).select("cand_id", "codes")
    assert(streamedCodes.exceptAll(flatCodes).isEmpty &&
      flatCodes.exceptAll(streamedCodes).isEmpty,
      "streamed PQ codes diverge from a flat append's")
  }
}
