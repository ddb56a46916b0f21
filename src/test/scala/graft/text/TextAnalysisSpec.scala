package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("language ID identifies real sentences by marker profile") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and it is happy", "en"),
      (2L, "der hund ist nicht klein und das haus ist alt", "de"),
      (3L, "el perro es grande y la casa es una maravilla por ahora", "es"),
      (4L, "le chat est dans la maison et les oiseaux dans une cage", "fr"),
      (5L, "今天天气很好我们去公园", "zh")
    ).toDF("doc_id", "text", "expected")
    val pred = TextAnalysis.languageId(samples)
      .join(samples, Seq("doc_id"))
      .select("doc_id", "pred_lang", "expected").collect()
    pred.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"doc ${r.getLong(0)}: predicted ${r.getString(1)}")
    }
  }

  test("fingerprints: identical text ⇒ identical digests; edits change fp_full") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L)._1 !== fp(3L)._1)
  }

  test("shingles produce n-k+1 positional k-grams in order") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val sh = df.select(TextAnalysis.shingles(
      TextAnalysis.tokens(col("text")), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(sh === Seq("a b c", "b c d", "c d e"))
  }

  test("shingles of a doc shorter than k are empty, not a crash") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, ""), (3L, "x y z")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), TextAnalysis.shingles(
        TextAnalysis.tokens(col("text")), 3).as("sh"))
      .orderBy("doc_id").collect()
    assert(sh(0).getSeq[String](1).isEmpty)   // 2 tokens < k
    assert(sh(1).getSeq[String](1).isEmpty)   // split("") = [""], 1 token
    assert(sh(2).getSeq[String](1) === Seq("x y z"))
  }

  test("subword pieces split letters, digits and marks") {
    import spark.implicits._
    val df = Seq((1L, "hello world42 x-y!")).toDF("doc_id", "text")
    val pieces = df.select(TextAnalysis.subwordPieces(col("text")).as("p"))
      .collect()(0).getSeq[String](0)
    assert(pieces === Seq("hello", "world", "42", "x", "-", "y", "!"))
  }
}
