package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with JVM-native permission handling.
  *
  * Hadoop's `RawLocalFileSystem` applies file permissions through
  * `NativeIO.POSIX.chmod` when the hadoop native library is loaded —
  * and by FORKING a `chmod` process per created file/dir when it is
  * not (`Shell.execCommand`). Without native libs every parquet part
  * file, checksum shadow, `_SUCCESS` marker and committer temp dir
  * costs a ~10-15 ms fork on the creating thread; thread-sampling the
  * streaming microbatch thread showed these forks (plus `readlink`
  * forks in the FileContext rename path) owning the ~40 ms/op
  * walCommit/commitOffsets floor, while the actual write+rename I/O
  * is 0.04-0.4 ms. A deployment-grade cluster never pays this: HDFS/
  * S3 handle permissions server-side, and hosts with the native lib
  * chmod via JNI.
  *
  * This subclass restores the native behavior with pure JDK calls:
  * `setPermission` maps the 9 permission bits onto
  * `Files.setPosixFilePermissions` (the exact syscall `chmod` makes).
  * Permissions carrying bits NIO cannot express (sticky/setuid/
  * setgid) fall back to the stock path, so semantics are unchanged.
  *
  * Select with `spark.hadoop.fs.file.impl=graft.sources.NioLocalFileSystem`.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) super.setPermission(p, permission)
    else {
      val mapping = Seq(
        0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
        0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
        0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
      val perms = new java.util.HashSet[PosixFilePermission]()
      mapping.foreach { case (bit, perm) =>
        if ((bits & bit) != 0) perms.add(perm): Unit
      }
      try java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, perms)
      catch {
        // non-POSIX store or concurrent delete: the stock path's
        // error surface (it shells out and throws IOException)
        case _: UnsupportedOperationException =>
          super.setPermission(p, permission)
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getMessage)
      }
    }
  }
}
