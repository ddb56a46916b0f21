package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SimilarityQueries

/** IVF-SQ8 mechanical contracts — the oracle (driver gate)
  * hash-verifies the assign→prune→rank values; this spec pins what the
  * oracle can't see: the on-disk footprint between raw and PQ, the
  * pruned codes-only read, and that exact quantized-space scoring
  * keeps recall at the raw-vector probe's level (the property that
  * distinguishes SQ8 from ADC).
  */
class IvfSq8Spec extends SparkSpec {

  private def vecs = SimilarityQueries.doubleVecs(spark, sf)
  private val dir = "/tmp/graft_ivf_sq8_spec"
  private val rawDir = "/tmp/graft_ivf_sq8_spec_raw"
  private val pqDir = "/tmp/graft_ivf_sq8_spec_pq"

  private def treeBytes(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  test("SQ8 cells sit between raw and PQ on disk and carry codes only") {
    Similarity.buildIvfSq8Index(vecs, dir, nlist = 16)
    Similarity.buildIvfIndex(vecs, rawDir, nlist = 16)
    Similarity.buildIvfPqIndex(vecs, pqDir, nlist = 16)
    val ver = Similarity.indexVersion(spark, dir)
    val cells = spark.read.parquet(s"$dir/$ver/cells")
    assert(cells.columns.toSet == Set("cand_id", "codes", "centroid_id"),
      s"SQ8 cells must carry codes only: ${cells.columns.mkString(",")}")
    val sq8B = treeBytes(s"$dir/$ver/cells")
    val rawB = treeBytes(
      s"$rawDir/${Similarity.indexVersion(spark, rawDir)}/cells")
    val pqB = treeBytes(
      s"$pqDir/${Similarity.indexVersion(spark, pqDir)}/cells")
    // parquet overhead damps the 8x payload ratio at spec scale, but
    // the ordering raw > sq8 > pq must be decisive
    assert(sq8B * 2 < rawB, s"SQ8 $sq8B B not < 1/2 raw $rawB B")
    assert(pqB < sq8B, s"PQ $pqB B not < SQ8 $sq8B B")
  }

  test("the SQ8 probe scan is partition-pruned and reads no raw " +
       "vector column") {
    Similarity.buildIvfSq8Index(vecs, dir, nlist = 16)
    val probe = Similarity.ivfSq8ProbeIndexed(dir,
      vecs.filter(col("vec_id") < 8), 5, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("cells") && l.contains("PartitionFilters"))
      .getOrElse("")
    assert(scanLine.matches(".*PartitionFilters: \\[.*centroid_id.*\\].*"),
      s"no partition filter on the SQ8 cells scan:\n$plan")
    assert(!scanLine.contains("embedding"),
      "SQ8 probe should never read a raw vector column from the index")
    assert(probe.count() > 0)
  }

  test("exact quantized-space scoring: SQ8 recall matches the " +
       "raw-vector probe's on the same cells (no ADC-style decay)") {
    Similarity.buildIvfSq8Index(vecs, dir, nlist = 16)
    Similarity.buildIvfIndex(vecs, rawDir, nlist = 16)
    val probes = vecs.filter(col("vec_id") < 8)
    val bruteTop = Similarity.bruteForceTopK(vecs, probes, 5)
      .select(col("query_id"), col("cand_id"))
    val n = bruteTop.count().toDouble
    val rawHits = Similarity.ivfProbeIndexed(rawDir, probes, 5)
      .select(col("query_id"), col("cand_id"))
      .intersect(bruteTop).count()
    val sq8Hits = Similarity.ivfSq8ProbeIndexed(dir, probes, 5)
      .select(col("query_id"), col("cand_id"))
      .intersect(bruteTop).count()
    // int8 rounding can flip a near-tie either way; within one hit of
    // the raw probe (PQ at the same geometry loses far more)
    assert(math.abs(sq8Hits - rawHits) <= math.max(1, (0.1 * n).toInt),
      s"SQ8 recall $sq8Hits/$n far from raw probe's $rawHits/$n")
  }

  test("append: delta lands as its own codes-only segment bit-equal " +
       "to a rebuild's codes; tagged replay and empty deltas commit " +
       "nothing") {
    val dir2 = "/tmp/graft_ivf_sq8_append_spec"
    val p = new org.apache.hadoop.fs.Path(dir2)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(p)) fsys.delete(p, true)
    val base = vecs.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val delta = vecs.filter(pmod(col("vec_id"), lit(3)) === 0)
    Similarity.buildIvfSq8Index(base, dir2, nlist = 16)
    Similarity.appendIvfSq8Index(dir2, delta, tag = Some("b0"))
    val ver = Similarity.indexVersion(spark, dir2)
    val segs = Similarity.indexSegments(spark, dir2, ver)
    assert(segs.size == 2, s"expected base+delta segments: $segs")
    // the per-row symmetric quantizer has NO trained state beyond the
    // frozen centroids, so the delta's stored codes are bit-identical
    // to quantizing the delta directly (what a full rebuild stores)
    val stored = spark.read.parquet(s"$dir2/${segs.last}/cells")
      .select(col("cand_id"), col("codes"))
    val expected = delta.select(col("vec_id").as("cand_id"),
      org.apache.spark.sql.graft.Native.quantizeI8(col("embedding"))
        .as("codes"))
    assert(stored.exceptAll(expected).isEmpty &&
      expected.exceptAll(stored).isEmpty,
      "delta codes diverge from a direct re-quantization")
    // probing the appended index fans out across segments and
    // surfaces delta candidates too
    val cand = Similarity.ivfSq8ProbeIndexed(dir2,
      vecs.filter(col("vec_id") < 8), 5)
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(cand.exists(_ % 3 == 0), s"no delta candidate in $cand")
    // exactly-once + quiet ticks
    def nVersions = fsys.listStatus(p)
      .count(st => st.isDirectory && st.getPath.getName.startsWith("v-"))
    val before = nVersions
    Similarity.appendIvfSq8Index(dir2, delta, tag = Some("b0"))
    assert(nVersions == before, "replayed tagged append committed")
    Similarity.appendIvfSq8Index(dir2, delta.filter(lit(false)))
    assert(nVersions == before, "empty append committed a segment")
  }

  test("streaming ingest runs multiple micro-batches and converges " +
       "to the flat-append index") {
    import graft.ops.SimilarityQueries
    SimilarityQueries.queries
      .find(_.name == "sim_stream_sq8_ingest").get.fn(spark, sf).count()
    // the query scopes its scratch under the per-pid session root
    // (QueryPack.scratch) — the old fixed /tmp/graft_sq8_stream path
    // only resolved on hosts with stale pre-r12 litter
    val dir = graft.ops.QueryPack.scratch("sq8_stream", sf) + "/index"
    val ver = Similarity.indexVersion(spark, dir)
    val segs = Similarity.indexSegments(spark, dir, ver)
    assert(segs.size >= 3,
      s"expected base + >=2 streamed segments, got $segs")
    // streamed segments carry codes bit-identical to a flat append's
    // (per-row quantizer, frozen centroids): probe results must match
    // an index built+appended in one batch over the same split
    val flatDir = "/tmp/graft_sq8_stream_flat_spec"
    val p = new org.apache.hadoop.fs.Path(flatDir)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(p)) fsys.delete(p, true)
    val vs = vecs
    Similarity.buildIvfSq8Index(
      vs.filter(pmod(col("vec_id"), lit(3)) =!= 0), flatDir)
    // flat twin must rank against the SAME frozen centroids the
    // streamed index trained, or cell assignment (and thus candidate
    // sets) legitimately differ — compare the full stored code sets
    val streamedCodes = segs.map(s =>
        spark.read.parquet(s"$dir/$s/cells"))
      .reduce(_ unionByName _).select("cand_id", "codes")
    Similarity.appendIvfSq8Index(flatDir,
      vs.filter(pmod(col("vec_id"), lit(3)) === 0))
    val flatVer = Similarity.indexVersion(spark, flatDir)
    val flatCodes = Similarity.indexSegments(spark, flatDir, flatVer)
      .map(s => spark.read.parquet(s"$flatDir/$s/cells"))
      .reduce(_ unionByName _).select("cand_id", "codes")
    assert(streamedCodes.exceptAll(flatCodes).isEmpty &&
      flatCodes.exceptAll(streamedCodes).isEmpty,
      "streamed SQ8 codes diverge from a flat append's")
  }
}
