package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextQueries
import graft.text.{Dedup, TextAnalysis}

/** The portable md5-seeded kernels (`graft_minhash_md5`,
  * `graft_simhash_md5`) must be bit-identical to their independent
  * formulations: a pure-SQL HOF replay for MinHash, a driver-side
  * MessageDigest reference for SimHash. They exist so the LSH dedup
  * queries oracle in DuckDB — the xxhash64 kernels remain the
  * production paths.
  */
class PortableHashSpec extends SparkSpec {

  private def docs = TextQueries.plantedDocs(spark, sf)

  test("graft_minhash_md5 equals the HOF md5 formulation, every doc") {
    val native = Dedup.minHashSignaturesMd5(docs, numHashes = 8, k = 3)
    // independent formulation: string shingles + interpreted lambdas
    val hof = docs
      .where(expr("size(split(text, chr(32))) >= 3"))
      .select(col("doc_id"),
        TextAnalysis.shingles(split(col("text"), " "), 3).as("sh"))
      .select(col("doc_id"), expr(
        "transform(sequence(0, 7), i -> " +
          "array_min(transform(sh, s -> " +
          "md5(concat(cast(i as string), ':', s)))))").as("sig"))
    val diff = native.as("n")
      .join(hof.as("a"), col("n.doc_id") === col("a.doc_id"))
      .filter(to_json(col("n.sig")) =!= to_json(col("a.sig")))
    assert(diff.isEmpty, "md5 signatures diverge from the HOF replay")
    assert(native.count() === hof.count())
  }

  test("graft_simhash_md5 equals a driver-side MessageDigest reference") {
    val rows = Dedup.simHashMd5(docs.limit(200))
      .join(docs.limit(200), Seq("doc_id"))
      .select("doc_id", "simhash_bits", "text")
      .collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val counts = new Array[Int](64)
      r.getString(2).split(" ", -1).foreach { t =>
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        (0 until 64).foreach { b =>
          val bit = (d(b >>> 3) >>> (7 - (b & 7))) & 1
          counts(b) += (if (bit == 1) 1 else -1)
        }
      }
      val expected =
        (0 until 64).map(b => if (counts(b) > 0) '1' else '0').mkString
      assert(r.getString(1) === expected, s"doc ${r.getLong(0)}")
    }
  }

  test("md5 LSH minhash finds all exact planted pairs") {
    // +1000000 planted docs are EXACT copies: identical signatures →
    // identical band buckets → est_jaccard 1.0 (other high-similarity
    // pairs may legitimately also surface, e.g. the +2000000 near
    // copies whose appended token doesn't move any of the 16 mins)
    val pairs = Dedup.minHashLshPairsMd5(docs,
      numHashes = 16, bands = 4, k = 3, threshold = 0.7).cache()
    val found = pairs.filter(col("est_jaccard") === 1.0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = docs.filter(col("doc_id") >= 1000000L &&
        col("doc_id") < 2000000L)
      .select((col("doc_id") - 1000000L).as("orig"))
      .collect().map(_.getLong(0)).toSet
    exact.foreach { id =>
      assert(found.contains((id, id + 1000000L)),
        s"identical md5 signatures must always collide (doc $id)")
    }
  }

  test("md5 simhash pairs find exact planted pairs at hamming 0") {
    val pairs = Dedup.simHashPairsMd5(docs, maxHamming = 3).cache()
    val zero = pairs.filter(col("hamming") === 0L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = docs.filter(col("doc_id") >= 1000000L &&
        col("doc_id") < 2000000L)
      .select((col("doc_id") - 1000000L).as("orig"))
      .collect().map(_.getLong(0)).toSet
    exact.foreach { id =>
      assert(zero.contains((id, id + 1000000L)),
        s"exact copy must have hamming 0 (doc $id)")
    }
  }
}
