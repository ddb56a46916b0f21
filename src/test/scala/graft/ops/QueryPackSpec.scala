package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The session scratch root's security contract (ADVICE r12 low #5):
  * the root is CREATED by this process (never adopted from a
  * pre-existing /tmp entry another local user could have planted),
  * and exit-time cleanup never traverses directory symlinks. The
  * shutdown hook itself can't run inside a test, but its two inputs
  * can be pinned: the root's provenance and the symlink-detection
  * primitive the hook's rm() branches on.
  */
class QueryPackSpec extends graft.SparkSpec {

  test("sessionRoot exists, is a real directory this process created " +
      "(pid-token or unpredictable fallback), and is not a symlink") {
    val root = QueryPack.sessionRoot
    assert(root.isDirectory)
    assert(root.isAbsolute)
    assert(!java.nio.file.Files.isSymbolicLink(root.toPath))
    val name = root.getName
    // primary: graft_p<pid>; fallback: graft_p<pid>_<random> — both
    // carry this process's pid token, so a foreign dir can never be
    // adopted silently
    assert(name.startsWith(s"graft_${QueryPack.sessionToken}"),
      s"unexpected session root name: $name")
    // mode 700 on BOTH creation routes (ADVICE r13: the primary used
    // to inherit the umask, typically 755 — index/scratch contents
    // must not be readable by other local users on a shared host)
    val perms = java.nio.file.Files.getPosixFilePermissions(root.toPath)
    assert(java.nio.file.attribute.PosixFilePermissions.toString(perms)
      === "rwx------", s"session root not owner-only: $perms")
  }

  test("scratch paths nest under the session root with the sf dir " +
      "sanitized to one path segment") {
    val p = QueryPack.scratch("ivf_index", "/root/testdata/sf0.01")
    assert(p.startsWith(QueryPack.sessionRoot.getAbsolutePath + "/"))
    val rel = p.stripPrefix(QueryPack.sessionRoot.getAbsolutePath + "/")
    assert(rel === "ivf_index/_root_testdata_sf0_01")
    // two kinds at one sf dir never collide; one kind at two sf dirs
    // never collides
    assert(QueryPack.scratch("other", "/root/testdata/sf0.01") !== p)
    assert(QueryPack.scratch("ivf_index", "/root/testdata/sf0.1") !== p)
  }

  test("the cleanup's symlink guard: isSymbolicLink detects a planted " +
      "directory symlink, and deleting the link as a LINK leaves the " +
      "target intact (the traversal the old listFiles recursion had)") {
    val victim = java.nio.file.Files.createTempDirectory("graft_victim")
    val inside = victim.resolve("precious.txt")
    java.nio.file.Files.writeString(inside, "survives")
    val planted = java.nio.file.Files.createTempDirectory("graft_plant")
      .resolve("link")
    java.nio.file.Files.createSymbolicLink(planted, victim)
    // the hook's branch: a symlink is never listFiles()-traversed —
    // delete the link itself only
    assert(java.nio.file.Files.isSymbolicLink(planted))
    assert(planted.toFile.delete())
    assert(java.nio.file.Files.exists(inside),
      "deleting the symlink must not touch the target's contents")
    java.nio.file.Files.delete(inside)
    java.nio.file.Files.delete(victim)
    java.nio.file.Files.delete(planted.getParent): Unit
  }

  test("releaseRetainedBlocks drops RDD-level persists the SQL cache " +
      "clear can't see (VERDICT r13 item 3: retained localCheckpoint " +
      "blocks accumulated across the 173-query bench JVM to an OOM)") {
    import spark.implicits._
    // suites share one SparkSession and run concurrently, so global
    // counts race with other suites' persist/unpersist traffic —
    // track the ids THIS test's checkpoint added, not the census
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cp = Seq(1, 2, 3).toDF("x").localCheckpoint()
    assert(cp.count() == 3)
    def added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty,
      "localCheckpoint did not register a persistent RDD")
    // the SQL-cache clear alone must NOT release it — that gap is the
    // bug this function exists to close
    spark.catalog.clearCache()
    assert(added.nonEmpty)
    val held = added
    QueryPack.releaseRetainedBlocks(spark)
    assert((spark.sparkContext.getPersistentRDDs.keySet & held).isEmpty,
      s"retained RDDs survived release: ${
        spark.sparkContext.getPersistentRDDs.keys}")
  }
}
