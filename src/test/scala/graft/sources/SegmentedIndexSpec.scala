package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The ONE spec for the shared segmented-index commit protocol all
  * four persisted families (shingle, IVF raw/PQ/SQ8) now ride:
  * pointer-flip atomicity, manifest resolution, manifest-aware GC
  * pinning, tagged-replay idempotence, and the single-writer fence.
  * Family specs (DedupSpec, IvfIndexSpec, IvfPqSpec, IvfSq8Spec) keep
  * only their domain payload contracts.
  */
class SegmentedIndexSpec extends SparkSpec {

  private val root = "/tmp/graft_segidx_spec"

  private def fs = SegmentedIndex.fsFor(spark, root)

  private def freshRoot(): Unit = {
    val p = new Path(root)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
  }

  /** A minimal "data write": version dir with one marker data file —
    * the protocol never looks inside data files.
    */
  private def writeData(version: String): Unit = {
    val out = fs.create(new Path(s"$root/$version/data"), true)
    try out.write("x".getBytes("UTF-8")) finally out.close()
  }

  private def exists(version: String): Boolean =
    fs.exists(new Path(s"$root/$version"))

  test("build commit flips _CURRENT; a partial dir (no marker) is " +
       "never current and never consumes a keep slot") {
    freshRoot()
    writeData("v-0000000000010-base0001")
    SegmentedIndex.commitBuild(spark, root, "v-0000000000010-base0001")
    assert(SegmentedIndex.currentVersion(spark, root)
      == "v-0000000000010-base0001")
    // a crashed build: data landed, no commit — current stays put and
    // segments() of the committed version resolves to itself
    writeData("v-0000000000020-crash001")
    assert(SegmentedIndex.currentVersion(spark, root)
      == "v-0000000000010-base0001")
    assert(SegmentedIndex.segments(spark, root,
      "v-0000000000010-base0001") == Seq("v-0000000000010-base0001"))
  }

  test("append commit writes the chained manifest and GC pins every " +
       "segment a kept version references") {
    freshRoot()
    val v1 = "v-0000000000010-base0001"
    val v2 = "v-0000000000020-app00001"
    val v3 = "v-0000000000030-app00002"
    writeData(v1)
    SegmentedIndex.commitBuild(spark, root, v1)
    writeData(v2)
    SegmentedIndex.commitAppend(spark, root, v2, v1, Seq(v1), None)
    writeData(v3)
    SegmentedIndex.commitAppend(spark, root, v3, v2, Seq(v1, v2), None)
    assert(SegmentedIndex.currentVersion(spark, root) == v3)
    assert(SegmentedIndex.segments(spark, root, v3) == Seq(v1, v2, v3))
    // keep=2 keeps v3+v2; v1 is OLDER than the cutoff but pinned by
    // both kept manifests — the append chain must stay probe-able
    assert(exists(v1) && exists(v2) && exists(v3))
    // a fresh REBUILD (no manifest) then one append off it: the old
    // chain drops out of every kept manifest and is collected
    val v4 = "v-0000000000040-base0002"
    val v5 = "v-0000000000050-app00003"
    writeData(v4)
    SegmentedIndex.commitBuild(spark, root, v4)
    writeData(v5)
    SegmentedIndex.commitAppend(spark, root, v5, v4, Seq(v4), None)
    SegmentedIndex.awaitGc() // async vacuum since r14
    assert(exists(v4) && exists(v5))
    assert(!exists(v1) && !exists(v2) && !exists(v3),
      "unreferenced old chain should be collected once no kept " +
        "manifest pins it")
  }

  test("a committed tag no-ops the replay; a fresh tag does not") {
    freshRoot()
    val v1 = "v-0000000000010-base0001"
    val v2 = "v-0000000000020-app00001"
    writeData(v1)
    SegmentedIndex.commitBuild(spark, root, v1)
    writeData(v2)
    SegmentedIndex.commitAppend(spark, root, v2, v1, Seq(v1),
      Some("stream-a#0"))
    val segs = SegmentedIndex.segments(spark, root,
      SegmentedIndex.currentVersion(spark, root))
    assert(SegmentedIndex.tagCommitted(spark, root, segs,
      Some("stream-a#0")), "committed tag must be visible on the chain")
    assert(!SegmentedIndex.tagCommitted(spark, root, segs,
      Some("stream-a#1")))
    assert(!SegmentedIndex.tagCommitted(spark, root, segs, None))
  }

  test("single-writer fence: an append whose parent is no longer " +
       "_CURRENT fails loudly instead of dropping the other writer's " +
       "segment") {
    freshRoot()
    val v1 = "v-0000000000010-base0001"
    writeData(v1)
    SegmentedIndex.commitBuild(spark, root, v1)
    // writer A reads its parent...
    val parentA = SegmentedIndex.currentVersion(spark, root)
    val segsA = SegmentedIndex.segments(spark, root, parentA)
    // ...writer B commits an append meanwhile...
    val vB = "v-0000000000020-writerB1"
    writeData(vB)
    SegmentedIndex.commitAppend(spark, root, vB, v1, Seq(v1), None)
    // ...writer A's commit must now FAIL, not silently drop vB
    val vA = "v-0000000000030-writerA1"
    writeData(vA)
    val e = intercept[IllegalArgumentException] {
      SegmentedIndex.commitAppend(spark, root, vA, parentA, segsA, None)
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the fence left the committed state intact: vB still current,
    // its segment still on the chain
    assert(SegmentedIndex.currentVersion(spark, root) == vB)
    assert(SegmentedIndex.segments(spark, root, vB) == Seq(v1, vB))
  }
}
