package graft.sources

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermissions

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

import graft.SparkSpec

/** The fork-free local FS must be behaviorally identical to stock
  * hadoop local FS for everything the engine does: same permission
  * bits on created files, same FileNotFound surface, same fallback on
  * modes NIO cannot express.
  */
class NioLocalFileSystemSpec extends SparkSpec {

  private def hadoopFs = {
    val fs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[NioLocalFileSystem],
      s"test session must run on NioLocalFileSystem, got ${fs.getClass}")
    fs
  }

  test("file:// resolves to NioLocalFileSystem in the engine session " +
       "and setPermission applies the exact bits via NIO") {
    val fs = hadoopFs
    val dir = Files.createTempDirectory("niofs").toString
    val p = new Path(s"$dir/f1")
    val out = fs.create(p, true)
    try out.write("x".getBytes("UTF-8")) finally out.close()
    fs.setPermission(p, new FsPermission(Integer.parseInt("640", 8).toShort))
    val posix = PosixFilePermissions.toString(
      Files.getPosixFilePermissions(java.nio.file.Paths.get(s"$dir/f1")))
    assert(posix == "rw-r-----")
    fs.setPermission(p, new FsPermission(Integer.parseInt("755", 8).toShort))
    val posix2 = PosixFilePermissions.toString(
      Files.getPosixFilePermissions(java.nio.file.Paths.get(s"$dir/f1")))
    assert(posix2 == "rwxr-xr-x")
  }

  test("setPermission on a missing path surfaces FileNotFoundException " +
       "like the stock FS") {
    val fs = hadoopFs
    intercept[java.io.FileNotFoundException] {
      fs.setPermission(new Path("/tmp/niofs-definitely-absent-7731"),
        new FsPermission(Integer.parseInt("644", 8).toShort))
    }
  }

  test("a parquet write through the engine session round-trips and " +
       "lands group/other-readable per the default umask") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("niofswrite").toString
    spark.range(10).withColumn("v", col("id") * 2)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 10)
    assert(back.agg(sum("v")).head().getLong(0) == 90L)
  }

  test("streamSession sets the FileSystem-based checkpoint manager for " +
       "local checkpoints and the requested shuffle width") {
    val s2 = graft.ops.QueryPack.streamSession(spark, 6, "/tmp/cpdir")
    assert(s2.conf.get("spark.sql.shuffle.partitions") == "6")
    assert(s2.conf.get("spark.sql.streaming.checkpointFileManagerClass")
      .endsWith("FileSystemBasedCheckpointFileManager"))
    // parent session untouched
    assert(spark.conf.getOption(
      "spark.sql.streaming.checkpointFileManagerClass").isEmpty)
  }
}
