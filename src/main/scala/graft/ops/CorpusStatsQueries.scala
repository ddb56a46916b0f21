package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CountMin, Native}

import graft.sources.Tables

/** Corpus-statistics operators a training-data pipeline runs between
  * cleaning and mixing: TF-IDF keyword extraction, bigram-LM scoring
  * (the classic perplexity filter), PMI co-occurrence mining,
  * deterministic weighted sampling, and count-min point-frequency
  * estimation over an unbounded key domain.
  *
  * Anchors: these are north-star extensions (BASELINE.json
  * `north_star`: "add the LLM-data-pipeline operators ... text
  * analysis"), not reimplementations of a reference script — the
  * toolkit's only monitoring surface is the MSK cluster's
  * PER_TOPIC_PER_PARTITION metric level
  * (/root/reference/bin/msk-cluster.sh:71), which counts per-topic
  * event flow; at engine scale per-key tallies over unbounded domains
  * become the sketch/sample operators here.
  *
  * Determinism contract (QueryPack scaladoc): irrational-family
  * scores (ln of integer ratios) are rounded BEFORE any ranking so a
  * last-ulp libm divergence can't flip an order; all ranking keys
  * carry a lexicographic tiebreak; double sums go through exact
  * DECIMAL.
  */
object CorpusStatsQueries extends QueryPack {

  /** Smoothed IDF: ln((N+1)/(df+1)) — integer-ratio argument, so the
    * rounded score is tie-safe.
    */
  override def queries: Seq[Q] = Seq(

    // TF-IDF KEYWORD EXTRACTION — top-3 terms per document. Corpus
    // pass 1: per-(doc, term) counts; pass 2: document frequency from
    // the (doc, term) pairs (vocab-sized, broadcast back — same
    // "vocab ≪ corpus at any scale" argument as text_unigram_logprob).
    // Ranking is row_number ≤ 3 on the ROUNDED score with a term
    // tiebreak, so Spark plans a WindowGroupLimit (per-partition top-3
    // before the window shuffle) instead of a full per-doc sort.
    Q("text_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.count()
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val scored = tf.join(broadcast(dfq), Seq("tok"))
          .select(col("doc_id"), col("tok"),
            round(col("tf").cast("double") *
              log(lit(n + 1.0) / (col("df").cast("double") + lit(1.0))),
              6).as("tfidf_r"))
        scored
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("tfidf_r").desc, col("tok"))))
          .filter(col("rk") <= 3)
          .select("doc_id", "tok", "tfidf_r", "rk")
          .orderBy("doc_id", "rk")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        | df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT count(*) AS n FROM documents),
        | sc AS (
        |  SELECT doc_id, tok,
        |         round(CAST(tf AS DOUBLE) *
        |               ln((n + 1.0) / (CAST(df AS DOUBLE) + 1.0)), 6)
        |           AS tfidf_r
        |  FROM tf JOIN df USING (tok), n),
        | r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf_r DESC, tok) AS rk
        |  FROM sc)
        |SELECT doc_id, tok, tfidf_r, rk FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin)),

    // BIGRAM-LM QUALITY SCORE — per-doc mean bigram surprisal under
    // the corpus's own add-½-smoothed bigram model: the perplexity
    // filter LLM pipelines run after the unigram one
    // (text_unigram_logprob). p(v|u) = (C(u,v)+½)/(C(u·)+½V)
    // = (2·C(u,v)+1)/(2·C(u·)+V) — an integer ratio, so the rounded
    // surprisal is tie-safe. The bigram model is joined back by
    // (prev, tok) WITHOUT a broadcast hint: bigram vocabulary grows
    // far past unigram vocabulary at corpus scale, so the right plan
    // is a shuffle hash join that AQE demotes to broadcast only when
    // the model measures small.
    Q("text_bigram_lm",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val bi = toks
          .withColumn("prev", lag("tok", 1).over(
            Window.partitionBy("doc_id").orderBy("pos")))
          .filter(col("prev").isNotNull)
          .select("doc_id", "prev", "tok")
        val vocabN = toks.select(countDistinct(col("tok"))).head().getLong(0)
        // the MODEL is bigram-vocab-sized (≪ corpus bigram instances);
        // cache it so the context-count rollup and the score join read
        // it instead of re-running the corpus scan + lag window twice
        // (plan audit r11c: uncached, 3 corpus passes; cached, 2 — the
        // model-build pass and the scoring pass, the irreducible pair)
        val bc = bi.groupBy("prev", "tok").agg(count(lit(1)).as("cnt_uv"))
          .cache()
        val cc = bc.groupBy("prev").agg(sum(col("cnt_uv")).as("cnt_u"))
        val model = bc.join(cc, Seq("prev"))
          .select(col("prev"), col("tok"),
            round(-log((col("cnt_uv") * 2 + 1).cast("double") /
              (col("cnt_u") * 2 + lit(vocabN)).cast("double")), 6)
              .cast("decimal(18,6)").as("surprisal"))
        bi.join(model, Seq("prev", "tok"))
          .groupBy("doc_id")
          .agg((sum(col("surprisal")).cast("double") / count(lit(1)))
            .as("mean_bigram_surprisal"),
            count(lit(1)).as("n_bigrams"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        | bi AS (
        |  SELECT doc_id,
        |         unnest([struct_pack(prev := t[i], tok := t[i+1])
        |                 FOR i IN generate_series(1, len(t) - 1)],
        |                recursive := true)
        |  FROM t WHERE len(t) >= 2),
        | v AS (
        |  SELECT count(DISTINCT tok) AS vn
        |  FROM (SELECT unnest(t) AS tok FROM t)),
        | bc AS (SELECT prev, tok, count(*) AS cnt_uv FROM bi GROUP BY 1, 2),
        | cc AS (SELECT prev, sum(cnt_uv) AS cnt_u FROM bc GROUP BY 1),
        | model AS (
        |  SELECT prev, tok,
        |         CAST(round(-ln(CAST(cnt_uv * 2 + 1 AS DOUBLE) /
        |                        CAST(cnt_u * 2 + vn AS DOUBLE)), 6)
        |              AS DECIMAL(18,6)) AS surprisal
        |  FROM bc JOIN cc USING (prev), v)
        |SELECT doc_id,
        |  CAST(sum(surprisal) AS DOUBLE) / count(*)
        |    AS mean_bigram_surprisal,
        |  count(*) AS n_bigrams
        |FROM bi JOIN model USING (prev, tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // DETERMINISTIC WEIGHTED SAMPLE — A-ExpJ / exponential-draws
    // weighted sampling without replacement (Efraimidis & Spirakis,
    // IPL 2006): item i gets draw eᵢ = −ln(uᵢ)/wᵢ and the k smallest
    // draws win. uᵢ comes from a fixed integer hash of doc_id (a
    // Knuth multiplicative step into (0,1)), so the sample is
    // reproducible across engines AND across cluster sizes — the
    // property a training-mixture sample needs for lineage. The draw
    // is −ln(rational)/integer, transcendental for u≠1, so rounding
    // to 9 decimals is tie-safe; ordering carries a doc_id tiebreak.
    // Plan shape: no shuffle at all — a scan-side projection into a
    // TakeOrderedAndProject (global top-k by merge of per-partition
    // heaps), the same O(k)-state pattern as top_k_agg.
    Q("sample_weighted",
      (s, d) => {
        // doc_id is reduced mod p BEFORE the Knuth multiply: same u
        // (modular arithmetic), but the product is ≤ (p−1)·2654435761
        // ≈ 2.65e15 ≪ 2^63, so the hash can never Long-wrap (Spark
        // would wrap silently, DuckDB would raise — the engines must
        // not diverge at doc_id ≥ ~3.5e9).
        val u = (((col("doc_id") % lit(1000003L)) * lit(2654435761L)) %
          lit(1000003L) + lit(1L)).cast("double") / lit(1000004.0)
        Tables.documents(s, d)
          .filter(col("n_chars") >= 1)
          .select(col("doc_id"), col("n_chars").as("weight"),
            round(-log(u) / col("n_chars").cast("double"), 9).as("draw"))
          .orderBy(col("draw"), col("doc_id"))
          .limit(100)
      },
      Some("""SELECT doc_id, n_chars AS weight,
        |  round(-ln(((((doc_id % 1000003) * 2654435761) % 1000003) + 1) / 1000004.0)
        |        / n_chars, 9) AS draw
        |FROM documents WHERE n_chars >= 1
        |ORDER BY draw, doc_id LIMIT 100""".stripMargin)),

    // PER-GROUP WEIGHTED SAMPLE — the mixture-building primitive: k
    // weight-proportional picks WITHOUT replacement per language,
    // same deterministic A-ExpJ draws as sample_weighted but ranked
    // within the group (row_number ≤ k plans as WindowGroupLimit, so
    // each partition forwards at most k rows per group to the window
    // shuffle — per-group top-k never materializes a group). Distinct
    // from pipeline_mixture_sample, which selects a TOKEN BUDGET in
    // md5-uniform order: this one is inclusion-probability ∝ weight.
    Q("sample_weighted_group",
      (s, d) => {
        // doc_id is reduced mod p BEFORE the Knuth multiply: same u
        // (modular arithmetic), but the product is ≤ (p−1)·2654435761
        // ≈ 2.65e15 ≪ 2^63, so the hash can never Long-wrap (Spark
        // would wrap silently, DuckDB would raise — the engines must
        // not diverge at doc_id ≥ ~3.5e9).
        val u = (((col("doc_id") % lit(1000003L)) * lit(2654435761L)) %
          lit(1000003L) + lit(1L)).cast("double") / lit(1000004.0)
        Tables.documents(s, d)
          .filter(col("n_chars") >= 1)
          .select(col("lang"), col("doc_id"), col("n_chars").as("weight"),
            round(-log(u) / col("n_chars").cast("double"), 9).as("draw"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("lang").orderBy(col("draw"), col("doc_id"))))
          .filter(col("rk") <= 25)
          .orderBy("lang", "rk")
      },
      Some("""WITH draws AS (
        |  SELECT lang, doc_id, n_chars AS weight,
        |    round(-ln(((((doc_id % 1000003) * 2654435761) % 1000003) + 1) / 1000004.0)
        |          / n_chars, 9) AS draw
        |  FROM documents WHERE n_chars >= 1),
        | r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY lang ORDER BY draw, doc_id) AS rk
        |  FROM draws)
        |SELECT lang, doc_id, weight, draw, rk FROM r WHERE rk <= 25
        |ORDER BY lang, rk""".stripMargin)),

    // PMI CO-OCCURRENCE MINING — word-association pairs over per-doc
    // distinct tokens: pmi(a,b) = ln(n_ab·N / (df_a·df_b)). The
    // self-join on doc_id is the textbook quadratic trap; it is
    // bounded the same way every dedup operator here bounds blocking:
    // eligibility trims the vocabulary tails (df ≥ max(3, 0.5% of
    // docs) drops hapax noise, df ≤ 95% of docs drops the degenerate
    // everywhere-words), and pairs-per-doc is capped by one document's
    // distinct eligible tokens — bounded by doc length — so total work
    // stays linear in corpus size. (The ceiling is deliberately high:
    // the synthetic corpus draws from a ~31-token vocabulary where
    // every word is in ~80% of docs, i.e. PMI over common words IS the
    // signal; natural corpora just get a bigger constant cut.)
    // Integer ratio inside ln → rounded PMI is tie-safe; top-100 with
    // a lexicographic pair tiebreak.
    Q("text_cooccur_pmi",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.count()
        val dt = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
        // eligible vocabulary is vocab-sized — cache it so the a/b
        // self-join sides broadcast ONE computed copy instead of each
        // re-running the scan + distinct + df rollup (plan audit r11c:
        // 4 corpus scans → 3; the two dt scans are the self-join's
        // irreducible pair, recomputed rather than cached because dt
        // is corpus-sized)
        val dfq = dt.groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df") >= greatest(lit(3L), floor(lit(n) * lit(0.005))) &&
            col("df") <= lit(n) * lit(0.95))
          .cache()
        val dte = dt.join(broadcast(dfq), Seq("tok"))
        val a = dte.select(col("doc_id"), col("tok").as("tok_a"),
          col("df").as("df_a"))
        val b = dte.select(col("doc_id"), col("tok").as("tok_b"),
          col("df").as("df_b"))
        a.join(b, Seq("doc_id")).filter(col("tok_a") < col("tok_b"))
          .groupBy("tok_a", "tok_b", "df_a", "df_b")
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
          .select(col("tok_a"), col("tok_b"), col("n_ab"),
            round(log((col("n_ab") * lit(n)).cast("double") /
              (col("df_a") * col("df_b")).cast("double")), 6).as("pmi_r"))
          .orderBy(col("pmi_r").desc, col("tok_a"), col("tok_b"))
          .limit(100)
      },
      Some("""WITH dt AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | n AS (SELECT count(*) AS n FROM documents),
        | df AS (
        |  SELECT tok, count(*) AS df FROM dt GROUP BY 1
        |  HAVING count(*) >= greatest(3, floor((SELECT n FROM n) * 0.005))
        |     AND count(*) <= (SELECT n FROM n) * 0.95),
        | dte AS (SELECT doc_id, tok, df FROM dt JOIN df USING (tok)),
        | pairs AS (
        |  SELECT a.tok AS tok_a, b.tok AS tok_b,
        |         a.df AS df_a, b.df AS df_b, count(*) AS n_ab
        |  FROM dte a JOIN dte b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5)
        |SELECT tok_a, tok_b, n_ab,
        |  round(ln(CAST(n_ab * (SELECT n FROM n) AS DOUBLE) /
        |           CAST(df_a * df_b AS DOUBLE)), 6) AS pmi_r
        |FROM pairs
        |ORDER BY pmi_r DESC, tok_a, tok_b LIMIT 100""".stripMargin)),

    // COUNT-MIN POINT ESTIMATES — build one 4×256 sketch over ALL
    // event user_ids (a single exchange row of 1024 longs, whatever
    // the key cardinality), then read back point estimates for the
    // exact top-20 users next to their true counts. Because every
    // counter is an exact count of the rows hashing there, the DuckDB
    // oracle reproduces the sketch — and hence the estimates —
    // bit-for-bit via a GROUP BY over the same (a·x+b) mod p mod w
    // arithmetic: the estimate column is hash-verified, not just
    // bounded. CMS guarantee (asserted in CountMinSpec): est ≥ exact
    // always.
    Q("agg_countmin",
      (s, d) => {
        val depth = 4
        val width = 256
        val events = Tables.events(s, d)
        val sketch = events.agg(
          Native.countmin(col("user_id"), depth, width).as("counters"))
        val top = events.groupBy("user_id")
          .agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("user_id"))
          .limit(20)
        val est = (0 until depth).map { i =>
          element_at(col("counters"),
            (lit(i * width) +
              (((col("user_id") % CountMin.Prime) * CountMin.A(i) +
                CountMin.B(i)) % CountMin.Prime % width) + lit(1))
              .cast("int"))
        }.reduce(least(_, _))
        top.crossJoin(broadcast(sketch))
          .select(col("user_id"), col("exact_cnt"), est.as("est_cnt"))
          .orderBy(col("exact_cnt").desc, col("user_id"))
      },
      Some("""WITH p(i, a, b) AS (
        |  VALUES (0, 131071, 12345), (1, 524287, 67890),
        |         (2, 8191, 424242), (3, 6700417, 987654)),
        | cnt AS (
        |  SELECT i,
        |         ((user_id % 2147483647) * a + b) % 2147483647 % 256
        |           AS cell,
        |         count(*) AS c
        |  FROM events, p GROUP BY 1, 2),
        | ex AS (
        |  SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1
        |  ORDER BY exact_cnt DESC, user_id LIMIT 20)
        |SELECT ex.user_id, ex.exact_cnt, min(cnt.c) AS est_cnt
        |FROM ex CROSS JOIN p
        |JOIN cnt ON cnt.i = p.i
        | AND cnt.cell =
        |   ((ex.user_id % 2147483647) * p.a + p.b) % 2147483647 % 256
        |GROUP BY ex.user_id, ex.exact_cnt
        |ORDER BY exact_cnt DESC, user_id""".stripMargin))
  )
}
