package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. Everything is built-in
  * column expressions (whole-stage codegen, no UDFs) and embarrassingly
  * parallel — per-document narrow transforms that scale to any corpus
  * size with zero shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword pieces: runs of letters, runs of digits, or single
    * non-alphanumeric marks — a regex approximation of byte-pair merges.
    */
  def subwordPieces(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Word k-shingles: positional k-grams over the token array. A doc
    * shorter than k yields an EMPTY array — without the guard,
    * `sequence(0, size-k)` with a negative stop DESCENDS ([0, -1, …])
    * and the transform would hit the invalid index 0 of element_at.
    */
  def shingles(toks: Column, k: Int): Column = {
    // transform over an index sequence keeps this inside codegen; the
    // array is bounded by document length so no skew concern.
    val idx = sequence(lit(0), size(toks) - k)
    when(size(toks) >= k,
      transform(idx, i =>
        concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Per-document token/stopword counts — one narrow aggregation keyed by
    * doc, partial-aggregated map-side.
    */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        count(when(col("tok").isin(EnglishStopwords: _*), 1)).as("n_stop"))

  /** Language ID profiles: marker stopwords per language + a CJK-character
    * signal for zh. A real system uses char-n-gram models; the shape
    * (per-doc scoring against K static profiles, argmax) is identical.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "you", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ich", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "que", "por"),
    "fr" -> Seq("le", "la", "les", "est", "une", "des", "que", "dans"),
    "zh" -> Seq.empty) // zh detected by CJK codepoints, not stopwords

  /** Score one language: marker hit-rate over tokens. */
  private def markerScore(toks: Column, markers: Seq[String]): Column =
    if (markers.isEmpty) lit(0.0)
    else size(filter(toks, t => t.isin(markers: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** CJK-codepoint ratio of the raw text. */
  private def cjkRatio(text: Column): Column =
    (length(text) -
      length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Predict language per document: argmax over profile scores. */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = docs.select(
      col(idCol),
      markerScore(toks, LangMarkers("en")).as("score_en"),
      markerScore(toks, LangMarkers("de")).as("score_de"),
      markerScore(toks, LangMarkers("es")).as("score_es"),
      markerScore(toks, LangMarkers("fr")).as("score_fr"),
      cjkRatio(col(textCol)).as("score_zh"))
    val langs = Seq("en", "de", "es", "fr", "zh")
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn("pred_lang",
        when(best.getField("s") > 0.0, best.getField("l"))
          .otherwise(lit("unknown")))
      .withColumn("pred_score", best.getField("s"))
  }

  /** Content fingerprints: full-text digest + min-hash of 3-shingles
    * (a 1-permutation MinHash — robust to local edits, the building
    * block for near-dup clustering).
    */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol),
      md5(col(textCol)).as("fp_full"),
      org.apache.spark.sql.graft.Native.minShingleMd5(toks)
        .as("fp_minshingle"))
  }

  /** Pre-native HOF formulation of the min-shingle fingerprint — two
    * interpreted `transform` lambdas; kept as the equivalence reference
    * for the codegen'd `graft_min_shingle_md5` kernel
    * (FingerprintExpressionSpec).
    */
  def minShingleMd5Hof(toks: Column): Column =
    array_min(transform(shingles(toks, 3), s => md5(s)))
}
