package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Native

import graft.SparkSpec

/** Z-order layout: the Morton interleave is bit-correct, and a
  * z-ordered file set gives narrow per-file ranges in BOTH dimensions —
  * the skipping property — where a single-column sort only clusters its
  * leading key.
  */
class ZOrderSpec extends SparkSpec {

  test("Morton interleave is bit-exact") {
    val rows = spark.range(1).select(
      Native.morton(lit(3L), lit(1L), 2).as("a"),   // 11 ⨯ 01 → 1011
      Native.morton(lit(0L), lit(0L), 16).as("b"),
      Native.morton(lit(65535L), lit(65535L), 16).as("c"))
      .head()
    assert(rows.getLong(0) == 11L)
    assert(rows.getLong(1) == 0L)
    assert(rows.getLong(2) == (1L << 32) - 1)
  }

  test("z-order clusters both columns; plain time sort does not") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))

    val zDir = "/tmp/graft_zorder_test/z"
    val tDir = "/tmp/graft_zorder_test/t"
    Layout.writeZOrdered(ev, zDir, "user_id", "ts_us",
      bits = 16, numFiles = 24)
    ev.repartitionByRange(24, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(tDir)

    def fileRanges(dir: String, c: String): Array[(Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .collect()
        .map(r => (r.getDouble(1), r.getDouble(2)))

    def filesHit(ranges: Array[(Double, Double)], v: Double): Int =
      ranges.count { case (lo, hi) => lo <= v && v <= hi }

    val probes = ev.select("user_id").distinct()
      .orderBy("user_id").limit(10)
      .collect().map(_.getLong(0).toDouble)

    val zU = fileRanges(zDir, "user_id")
    val tU = fileRanges(tDir, "user_id")
    assert(zU.length >= 20 && tU.length >= 20, "too few files for signal")
    val zHits = probes.map(filesHit(zU, _)).sum.toDouble / probes.length
    val tHits = probes.map(filesHit(tU, _)).sum.toDouble / probes.length
    // the time-sorted layout spreads every user over ~every file; the
    // z-ordered one must confine a user to well under half as many
    assert(zHits < tHits / 2,
      s"z-order did not cluster user_id: z=$zHits vs t=$tHits files")

    // and the z-layout still clusters time: a single probe timestamp
    // must not appear in every file's [min,max] range
    val zT = fileRanges(zDir, "ts_us")
    val tsProbe = ev.agg(avg(col("ts_us"))).head().getDouble(0)
    assert(filesHit(zT, tsProbe) < zT.length * 7 / 10,
      "z-order lost all time clustering")
  }

  test("z-ordered data is the same data (layout changes placement only)") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val dir = "/tmp/graft_zorder_test/rt"
    Layout.writeZOrdered(ev, dir, "user_id", "ts_us", numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count() &&
      back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }
}
