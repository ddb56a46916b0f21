package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactFilesSpec extends SparkSpec {

  test("compaction collapses a many-tiny-files dir, data identical") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val src = s"$base/src"; val out = s"$base/out"
    val ev = Tables.events(spark, sf)
    ev.repartition(64).write.parquet(src)

    def fileCount(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p)
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    assert(fileCount(src) == 64)

    // target far above total bytes ⇒ exactly one output file
    Layout.compactFiles(spark, src, out)
    assert(fileCount(out) == 1, s"got ${fileCount(out)} files")
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count() &&
      back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)

    // tiny target ⇒ sized by the byte budget, not one monolith
    val out2 = s"$base/out2"
    Layout.compactFiles(spark, src, out2, targetFileBytes = 16 * 1024)
    assert(fileCount(out2) > 1 && fileCount(out2) < 64,
      s"got ${fileCount(out2)} files")
  }
}
