package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantics + plan-shape checks for the corpus-statistics pack.
  * Hash parity with DuckDB is the driver's gate; here we pin the math
  * against hand-computed fixtures and the plans against the scale
  * contracts the pack's scaladoc claims.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  // --- text_tfidf ---------------------------------------------------

  test("text_tfidf: at most 3 ranked terms per doc, scores non-increasing") {
    val rows = run("text_tfidf")
      .select("doc_id", "tfidf_r", "rk").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= 3, s"doc $doc has ${rs.length} terms")
      val ordered = rs.sortBy(_.getInt(2))
      assert(ordered.map(_.getInt(2)).sameElements(1 to ordered.length))
      val scores = ordered.map(_.getDouble(1))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores not non-increasing: ${scores.mkString(",")}")
    }
  }

  test("text_tfidf: hand-computed fixture") {
    val docs = Seq(
      (0L, "apple banana apple", "en", "t", 18L),
      (1L, "banana cherry", "en", "t", 13L),
      (2L, "cherry cherry cherry", "en", "t", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_tfidf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // N=3; df: apple 1, banana 2, cherry 2
    def idf(df: Int): Double = math.log(4.0 / (df + 1.0))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val doc0 = got.filter(_._1 == 0L)
    assert(doc0.head._2 == "apple" && doc0.head._3 == r6(2 * idf(1)))
    assert(doc0(1)._2 == "banana" && doc0(1)._3 == r6(1 * idf(2)))
    val doc2 = got.filter(_._1 == 2L)
    assert(doc2.length == 1 &&
      doc2.head._2 == "cherry" && doc2.head._3 == r6(3 * idf(2)))
  }

  test("text_tfidf: top-3 filter plans as WindowGroupLimit") {
    val p = run("text_tfidf").queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"row_number<=3 should prune below the window shuffle:\n$p")
  }

  // --- text_bigram_lm -----------------------------------------------

  test("text_bigram_lm: hand-computed add-half smoothing") {
    val docs = Seq(
      (0L, "a b a b", "en", "t", 7L),
      (1L, "a b", "en", "t", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bigram").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_bigram_lm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // bigrams: doc0 = (a,b),(b,a),(a,b); doc1 = (a,b)
    // C(a,b)=3, C(b,a)=1; C(a·)=3, C(b·)=1; V=2
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sAB = r6(-math.log((2.0 * 3 + 1) / (2.0 * 3 + 2))) // p(b|a)
    val sBA = r6(-math.log((2.0 * 1 + 1) / (2.0 * 1 + 2))) // p(a|b)
    val d0 = got.find(_._1 == 0L).get
    assert(d0._3 == 3L)
    assert(math.abs(d0._2 - (sAB * 2 + sBA) / 3.0) < 1e-9, d0)
    val d1 = got.find(_._1 == 1L).get
    assert(d1._3 == 1L && math.abs(d1._2 - sAB) < 1e-9, d1)
  }

  test("text_bigram_lm: one-token docs contribute no bigram rows") {
    val docs = Seq(
      (0L, "solo", "en", "t", 4L),
      (1L, "a b", "en", "t", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bigram1").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = SparkEntry.queries("text_bigram_lm")(spark, dir)
      .select("doc_id").as[Long].collect()
    assert(ids.sameElements(Array(1L)))
  }

  // --- sample_weighted -----------------------------------------------

  test("sample_weighted: equals the brute-force k smallest draws") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars")
      .as[(Long, Long)].collect()
    val brute = docs.filter(_._2 >= 1).map { case (id, w) =>
      val u = ((id * 2654435761L) % 1000003L + 1).toDouble / 1000004.0
      val draw = BigDecimal(-math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (draw, id)
    }.sorted.take(100).map(_._2)
    val got = run("sample_weighted").select("doc_id").as[Long].collect()
    assert(got.sameElements(brute))
  }

  test("sample_weighted: heavier weight can only shrink the draw") {
    // same u, w2 = 10*w1 ⇒ draw2 = draw1/10 — monotone inclusion: the
    // Efraimidis-Spirakis property that makes the sample weight-correct
    val id = 42L
    val u = ((id * 2654435761L) % 1000003L + 1).toDouble / 1000004.0
    assert(-math.log(u) / 1000.0 < -math.log(u) / 100.0)
  }

  test("sample_weighted: no shuffle — global top-k via TakeOrderedAndProject") {
    val p = run("sample_weighted").queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"weighted sample must not shuffle:\n$p")
  }

  test("sample_weighted_group: k per group, ranked by the same draws") {
    val rows = run("sample_weighted_group")
      .select("lang", "doc_id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= 25, s"$lang has ${rs.length}")
      assert(rs.map(_._3).sorted.sameElements(1 to rs.length))
    }
    // per-group picks = global brute force restricted to the group
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect()
    byLang.foreach { case (lang, rs) =>
      val brute = docs.filter(d => d._1 == lang && d._3 >= 1).map { d =>
        val u = ((d._2 * 2654435761L) % 1000003L + 1).toDouble / 1000004.0
        val draw = BigDecimal(-math.log(u) / d._3)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        (draw, d._2)
      }.sorted.take(25).map(_._2)
      assert(rs.sortBy(_._3).map(_._2).sameElements(brute), lang)
    }
  }

  test("sample_weighted_group: per-group top-k plans as WindowGroupLimit") {
    val p = run("sample_weighted_group").queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  // --- text_cooccur_pmi ----------------------------------------------

  test("text_cooccur_pmi: pair order is canonical and PMI matches hand calc") {
    val rows = run("text_cooccur_pmi")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, _, _) => assert(a < b, s"($a,$b) not canonical") }
    // recompute one row's PMI from first principles on the same data
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val dt = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok")).distinct()
      .as[(Long, String)].collect().groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    val (a, b, nab, pmi) = rows.head
    val dfA = dt(a).size
    val dfB = dt(b).size
    val expectNab = dt(a).intersect(dt(b)).size.toLong
    assert(nab == expectNab)
    val expect = BigDecimal(math.log(nab.toDouble * n / (dfA.toLong * dfB)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(pmi - expect) < 1e-9, s"($a,$b): $pmi vs $expect")
  }

  // --- agg_countmin ---------------------------------------------------

  test("agg_countmin: estimate ≥ exact for every reported key") {
    val rows = run("agg_countmin").collect()
    // sf0.001 has only 15 distinct users — LIMIT 20 caps, not pads
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"user ${r.getLong(0)}: est $est < exact $exact")
    }
  }
}
