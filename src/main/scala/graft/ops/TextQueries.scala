package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{Dedup, TextAnalysis}

/** Text-analysis + deduplication inventory over `documents`
  * (north-star extensions; SURVEY.md §7.1 M6).
  *
  * Near-dup queries PLANT duplicates inside the query (mirrored exactly
  * in the oracle SQL) because the synthetic corpus has none — detection
  * then has real signal at every SF.
  */
object TextQueries extends QueryPack {

  /** documents ∪ exact copies (doc_id+1M of every 7th doc)
    * ∪ near copies (doc_id+2M, one appended token, every 10th doc). */
  def plantedDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs
      .unionAll(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionAll(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" qq17")).as("text")))
  }

  private val plantedCte =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text || ' qq17' FROM documents
      |  WHERE doc_id % 10 = 0)""".stripMargin

  /** Shared replay for the three cross-boundary dedup forms
    * (`dedup_cross_corpus`, `dedup_index_probe`, `dedup_index_append`):
    * same plant, same pairs — recompute, persisted probe, and
    * build+append+probe must all be bit-identical to this SQL.
    */
  private val crossBoundaryOracle: String =
    """WITH ex AS (SELECT doc_id, text FROM documents),
      | inc AS (
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text || ' qq17' FROM documents
      |  WHERE doc_id % 10 = 0),
      | ta AS (SELECT doc_id, string_split(text, ' ') AS t FROM ex),
      | tb AS (SELECT doc_id, string_split(text, ' ') AS t FROM inc),
      | sa AS (SELECT DISTINCT doc_id,
      |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                  FOR i IN generate_series(1, len(t) - 2)]) AS shingle
      |        FROM ta),
      | sb AS (SELECT DISTINCT doc_id,
      |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                  FOR i IN generate_series(1, len(t) - 2)]) AS shingle
      |        FROM tb),
      | na AS (SELECT doc_id, count(*) AS n_a FROM sa GROUP BY doc_id),
      | nb AS (SELECT doc_id, count(*) AS n_b FROM sb GROUP BY doc_id),
      | common AS (
      |  SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
      |         count(*) AS n_common
      |  FROM sa JOIN sb USING (shingle) GROUP BY 1, 2)
      |SELECT a_id, b_id, n_common,
      |       CAST(n_common AS DOUBLE) /
      |         (na.n_a + nb.n_b - n_common) AS jaccard
      |FROM common
      |JOIN na ON na.doc_id = a_id
      |JOIN nb ON nb.doc_id = b_id
      |WHERE CAST(n_common AS DOUBLE) /
      |      (na.n_a + nb.n_b - n_common) >= 0.8
      |ORDER BY a_id, b_id""".stripMargin

  def queries: Seq[Q] = Seq(

    // Edit-distance verification of near-dup candidates: MinHash/LSH
    // band collisions propose pairs; levenshtein over a bounded prefix
    // CONFIRMS them (the cheap exact check real pipelines run before
    // merging clusters — bounded cost per pair regardless of doc size).
    Q("dedup_edit_verify",
      (s, d) => {
        val docs = plantedDocs(s, d)
        // candidates: the planted near-copies paired with their source
        val pairs = docs.filter(col("doc_id") >= 2000000L)
          .select((col("doc_id") - 2000000L).as("a_id"),
            col("doc_id").as("b_id"), col("text").as("b_text"))
        pairs.join(docs.select(col("doc_id").as("a_id"),
            col("text").as("a_text")), Seq("a_id"))
          .select(col("a_id"), col("b_id"),
            levenshtein(substring(col("a_text"), 1, 80),
              substring(col("b_text"), 1, 80)).as("prefix_dist"))
          .filter(col("prefix_dist") <= 5)
          .orderBy(col("a_id"))
      },
      Some(s"""$plantedCte
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80))
        |    AS prefix_dist
        |FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 2000000
        |WHERE levenshtein(substring(a.text, 1, 80),
        |                  substring(b.text, 1, 80)) <= 5
        |ORDER BY a_id""".stripMargin)),

    // Column profiling — the ANALYZE/data-quality pass every ingest
    // runs: per-column null counts, distincts, extrema in ONE scan
    // (single aggregation, map-side partials).
    Q("profile_columns",
      (s, d) => Tables.events(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("user_id")).as("user_id_nn"),
          countDistinct(col("user_id")).as("user_id_distinct"),
          countDistinct(col("event_type")).as("event_type_distinct"),
          min(col("value")).cast("double").as("value_min"),
          max(col("value")).cast("double").as("value_max"),
          min(col("event_id")).as("event_id_min"),
          max(col("event_id")).as("event_id_max")),
      Some("""SELECT count(*) AS n_rows,
        |  count(user_id) AS user_id_nn,
        |  count(DISTINCT user_id) AS user_id_distinct,
        |  count(DISTINCT event_type) AS event_type_distinct,
        |  CAST(min(value) AS DOUBLE) AS value_min,
        |  CAST(max(value) AS DOUBLE) AS value_max,
        |  min(event_id) AS event_id_min,
        |  max(event_id) AS event_id_max
        |FROM events""".stripMargin)),

    // Vocabulary build: corpus-wide token frequencies, top-100 — the
    // tokenizer-training precursor. explode → count is ONE map-side-
    // partial aggregation on a high-cardinality uniform key; the top-k
    // is TakeOrderedAndProject (per-partition heaps + driver merge of
    // 100 rows), never a full sort.
    Q("text_vocab",
      (s, d) => Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok"))
        .limit(100),
      Some("""SELECT tok, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY freq DESC, tok LIMIT 100""".stripMargin)),

    // Exact heavy hitters via the two-pass Misra-Gries pattern: sketch
    // (O(capacity) state, no full-cardinality shuffle) → exact verify
    // of the ≤capacity candidates. Result provably ≡ the plain
    // GROUP BY/HAVING the oracle runs, at any scale and merge order.
    Q("agg_heavy_hitters",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        HeavyHitters.heavyHitters(toks, col("tok"),
            minFraction = 0.002, capacity = 1024)
          .select(col("item").as("tok"), col("cnt"))
          .orderBy(col("cnt").desc, col("tok"))
      },
      Some("""WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT tok, count(*) AS cnt FROM toks
        |GROUP BY tok
        |HAVING count(*) >=
        |  CAST(ceil(0.002 * (SELECT count(*) FROM toks)) AS BIGINT)
        |ORDER BY cnt DESC, tok""".stripMargin)),

    // PII scrubbing — the redaction pass a training corpus runs before
    // anything else: RE2-compatible patterns (portable across engines)
    // for emails and long digit runs, applied as per-row codegen'd
    // regexp_replace chains. Zero shuffle; scales with bytes scanned.
    Q("text_redact_pii",
      (s, d) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val digits = "[0-9]{6,}"
        val redacted = regexp_replace(
          regexp_replace(col("text"), email, "<EMAIL>"),
          digits, "<NUM>")
        Tables.documents(s, d)
          .select(col("doc_id"), md5(redacted).as("redacted_md5"),
            (length(col("text")) - length(redacted)).as("len_delta"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'), '[0-9]{6,}', '<NUM>', 'g'))
        |    AS redacted_md5,
        |  length(text) - length(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'), '[0-9]{6,}', '<NUM>', 'g'))
        |    AS len_delta
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Bucketed histogram — corpus length distribution as a single
    // map-side-partial agg over floor-bucketed lengths (the shape of
    // any numeric histogram at scale: bucket count, not row count,
    // crosses the exchange).
    Q("text_histogram",
      (s, d) => Tables.documents(s, d)
        .select((floor(length(col("text")) / lit(200)) * 200)
          .cast("long").as("len_bucket"))
        .groupBy(col("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("len_bucket")),
      Some("""SELECT CAST(floor(length(text) / 200) * 200 AS BIGINT)
        |    AS len_bucket, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY len_bucket""".stripMargin)),

    // Repetition scoring (the Gopher-style quality signal): fraction
    // of a doc's 3-gram occurrences that are repeats — high values
    // flag boilerplate/spam. Entirely PER-ROW array math (shingle
    // list vs its distinct count): zero shuffle, scales with bytes.
    Q("text_repetition",
      (s, d) => {
        // the gram list (TextAnalysis.shingles — the dedup family's
        // positional k-gram builder) is materialized ONCE per row:
        // HOF lambdas evaluate interpreted, so a repeated expression
        // would re-build ~10³ strings per row per use (measured 3×
        // slower). The ratio ships UNROUNDED: the raw division is
        // bit-identical across engines, while round()'s tie behavior
        // on exactly-representable k/n values is not (Spark BigDecimal
        // half-up vs DuckDB x·10⁶ std::round diverge at n_grams=640).
        Tables.documents(s, d)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            (size(col("toks")) - 2).cast("long").as("n_grams"),
            TextAnalysis.shingles(col("toks"), 3).as("grams"))
          .select(col("doc_id"), col("n_grams"),
            (lit(1.0) -
              size(array_distinct(col("grams"))).cast("double") /
              col("n_grams").cast("double")).as("rep_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(1, len(toks)-1)),
        |      i -> array_to_string(toks[i:i+2], ' ')) AS grams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3)
        |SELECT doc_id, len(grams) AS n_grams,
        |  1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) /
        |        len(grams) AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin)),

    // Benchmark DECONTAMINATION — the corpus-hygiene pass every LLM
    // training build runs: drop training docs that share any 5-token
    // shingle with the eval set. The stand-in eval set is FIXED-SIZE
    // (doc_id < 25), which is what justifies the explicit broadcast:
    // a real eval suite is bounded (thousands of docs) no matter how
    // big the training corpus grows, so its distinct-shingle set
    // broadcasts and the corpus side streams one shingle-explode into
    // the broadcast semi-join — no corpus-side shuffle before the
    // per-doc hit count. Shingles are md5-of-joined-tokens
    // (TextAnalysis.shingles), portable across engines, so the whole
    // op hash-oracles; a production run swaps md5 for the codegen'd
    // 64-bit graft_shingles kernel (same candidate semantics, ~8×
    // cheaper hash) — md5 here buys cross-engine verifiability.
    Q("pipeline_decontaminate",
      (s, d) => {
        def shingled(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"),
            explode(transform(TextAnalysis.shingles(col("toks"), 5),
              g => md5(g))).as("sh"))
        val docs = Tables.documents(s, d)
        val bench = shingled(docs.filter(col("doc_id") < 25))
          .select("sh").distinct()
        shingled(docs.filter(col("doc_id") >= 25))
          .join(broadcast(bench), Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("sh")).as("n_hits"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(1, len(toks)-3)),
        |      i -> md5(array_to_string(toks[i:i+4], ' ')))) AS sh
        |  FROM docs),
        | bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 25)
        |SELECT s.doc_id, count(DISTINCT s.sh) AS n_hits
        |FROM sh s JOIN bench b USING (sh)
        |WHERE s.doc_id >= 25
        |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin)),

    // Sequence PACKING — bin documents into fixed-capacity token
    // windows (one bin = one training sequence) by greedy first-fit
    // over the deterministic doc_id order, per language. Runs as a
    // typed flatMapGroups scan (two longs of state per group).
    //
    // Oracle: greedy packing is inherently sequential, but the row-at-
    // a-time recursive-CTE replay is Θ(docs) iterations each rescanning
    // the input — it exceeded 900 s at the sf10 replica. This replay
    // exploits two identities instead: (1) the LAST doc of a sequence
    // starting at rn is the largest rn2 with cum(rn2) ≤ cum(rn-1)+512
    // (prefix sums make every boundary a single ASOF lookup, and an
    // over-capacity doc still occupies its own sequence — the
    // greatest(..., rn) guard); (2) `nxt` is a static pointer table, so
    // chaining it 16 times lets the recursion stride 16 sequences per
    // iteration and fan the intermediate starts back out afterwards —
    // ~150× fewer iterations. MATERIALIZED hints stop DuckDB from
    // inlining (= re-evaluating) the chain inside the recursive term.
    // Hash-verified identical to the row-at-a-time replay at sf0.01
    // and to the engine result at sf10 (22 s vs >900 s timeout).
    Q("pipeline_pack_sequences",
      (s, d) => graft.text.Packing
        .packSequences(Tables.documents(s, d), capacity = 512)
        .select(col("group").as("lang"), col("doc_id"), col("n_tok"),
          col("seq_id"))
        .orderBy(col("lang"), col("doc_id")),
      Some("""WITH RECURSIVE d AS (
        |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY doc_id) AS rn
        |  FROM documents),
        | cs AS MATERIALIZED (SELECT lang, doc_id, n_tok, rn,
        |          sum(n_tok) OVER (PARTITION BY lang ORDER BY rn) AS cum
        |        FROM d),
        | mx AS MATERIALIZED (SELECT lang, max(rn) AS mxr FROM d GROUP BY lang),
        | nxt AS MATERIALIZED (
        |  SELECT s.lang, s.rn, greatest(coalesce(e.rn, 0), s.rn) + 1 AS next_rn
        |  FROM (SELECT lang, rn, cum - n_tok + 512 AS target FROM cs) s
        |  ASOF LEFT JOIN cs e ON e.lang = s.lang AND e.cum <= s.target),
        | c0 AS (SELECT lang, rn AS s0, next_rn AS s1 FROM nxt),
        | c1 AS (SELECT c0.*, j.next_rn AS s2 FROM c0 LEFT JOIN nxt j ON j.lang = c0.lang AND j.rn = c0.s1),
        | c2 AS (SELECT c1.*, j.next_rn AS s3 FROM c1 LEFT JOIN nxt j ON j.lang = c1.lang AND j.rn = c1.s2),
        | c3 AS (SELECT c2.*, j.next_rn AS s4 FROM c2 LEFT JOIN nxt j ON j.lang = c2.lang AND j.rn = c2.s3),
        | c4 AS (SELECT c3.*, j.next_rn AS s5 FROM c3 LEFT JOIN nxt j ON j.lang = c3.lang AND j.rn = c3.s4),
        | c5 AS (SELECT c4.*, j.next_rn AS s6 FROM c4 LEFT JOIN nxt j ON j.lang = c4.lang AND j.rn = c4.s5),
        | c6 AS (SELECT c5.*, j.next_rn AS s7 FROM c5 LEFT JOIN nxt j ON j.lang = c5.lang AND j.rn = c5.s6),
        | c7 AS (SELECT c6.*, j.next_rn AS s8 FROM c6 LEFT JOIN nxt j ON j.lang = c6.lang AND j.rn = c6.s7),
        | c8 AS (SELECT c7.*, j.next_rn AS s9 FROM c7 LEFT JOIN nxt j ON j.lang = c7.lang AND j.rn = c7.s8),
        | c9 AS (SELECT c8.*, j.next_rn AS s10 FROM c8 LEFT JOIN nxt j ON j.lang = c8.lang AND j.rn = c8.s9),
        | c10 AS (SELECT c9.*, j.next_rn AS s11 FROM c9 LEFT JOIN nxt j ON j.lang = c9.lang AND j.rn = c9.s10),
        | c11 AS (SELECT c10.*, j.next_rn AS s12 FROM c10 LEFT JOIN nxt j ON j.lang = c10.lang AND j.rn = c10.s11),
        | c12 AS (SELECT c11.*, j.next_rn AS s13 FROM c11 LEFT JOIN nxt j ON j.lang = c11.lang AND j.rn = c11.s12),
        | c13 AS (SELECT c12.*, j.next_rn AS s14 FROM c12 LEFT JOIN nxt j ON j.lang = c12.lang AND j.rn = c12.s13),
        | c14 AS (SELECT c13.*, j.next_rn AS s15 FROM c13 LEFT JOIN nxt j ON j.lang = c13.lang AND j.rn = c13.s14),
        | c15 AS MATERIALIZED (SELECT c14.*, j.next_rn AS s16 FROM c14 LEFT JOIN nxt j ON j.lang = c14.lang AND j.rn = c14.s15),
        | starts16 AS (
        |  SELECT lang, CAST(0 AS BIGINT) AS seq0, CAST(1 AS BIGINT) AS rn
        |  FROM (SELECT DISTINCT lang FROM d)
        |  UNION ALL
        |  SELECT c.lang, p.seq0 + 16, c.s16
        |  FROM starts16 p
        |  JOIN c15 c ON c.lang = p.lang AND c.s0 = p.rn
        |  JOIN mx ON mx.lang = p.lang
        |  WHERE c.s16 IS NOT NULL AND c.s16 <= mx.mxr),
        | starts AS (
        |  SELECT p.lang,
        |         p.seq0 + unnest(generate_series(0, 15)) AS seq_id,
        |         unnest([c.s0, c.s1, c.s2, c.s3, c.s4, c.s5, c.s6, c.s7,
        |                 c.s8, c.s9, c.s10, c.s11, c.s12, c.s13, c.s14,
        |                 c.s15]) AS srn
        |  FROM starts16 p JOIN c15 c ON c.lang = p.lang AND c.s0 = p.rn),
        | valid AS (SELECT s.lang, s.seq_id, s.srn
        |           FROM starts s JOIN mx ON mx.lang = s.lang
        |           WHERE s.srn IS NOT NULL AND s.srn <= mx.mxr)
        |SELECT c.lang, c.doc_id, c.n_tok, v.seq_id
        |FROM cs c ASOF JOIN valid v ON v.lang = c.lang AND v.srn <= c.rn
        |ORDER BY c.lang, c.doc_id""".stripMargin)),

    // Composite training-data pipeline: quality gate → exact dedup →
    // per-language corpus stats — the end-to-end shape a 100 TB corpus
    // build runs. Every stage is deterministic, so the whole pipeline
    // oracles exactly. Scale shape: token stats are one map-side-partial
    // agg; the dedup rep-set groups on a content digest (uniform);
    // survivor selection is a key semi join; final agg is tiny.
    Q("pipeline_clean_corpus",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val stats = TextAnalysis.tokenStats(docs)
        val qual = docs.join(stats, Seq("doc_id"))
          .filter(col("n_chars").between(50L, 5000L) &&
            col("n_stop").cast("double") / col("n_tok").cast("double")
              <= 0.6)
        val reps = qual
          .groupBy(md5(col("text")).as("h"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        qual.join(reps, Seq("doc_id"), "left_semi")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | a AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |         count(CASE WHEN tok IN
        |           ('the','a','an','of','and','to','in','is','it','for')
        |           THEN 1 END) AS n_stop
        |  FROM t GROUP BY doc_id),
        | q AS (
        |  SELECT d.doc_id, d.lang, d.text, a.n_tok
        |  FROM documents d JOIN a USING (doc_id)
        |  WHERE d.n_chars BETWEEN 50 AND 5000
        |    AND CAST(a.n_stop AS DOUBLE) / a.n_tok <= 0.6),
        | reps AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text))
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM q JOIN reps USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Token counting: whitespace tokens + BPE-ish subword pieces.
    // NORMALIZATION — the cleanup stage every corpus runs before
    // tokenize/dedup: lowercase, strip non-retained characters, collapse
    // whitespace, trim. Pure per-row codegen'd regex work, zero
    // shuffles; the before/after char counts make shrinkage measurable.
    Q("text_normalize",
      (s, d) => {
        val cleaned = trim(regexp_replace(regexp_replace(
          lower(col("text")), "[^a-z0-9 .,!?']", " "), "\\s+", " "))
        // regex ABOVE the sort, not below: orderBy's range partitioner
        // runs a SAMPLING pass that fully executes its child, so a
        // regex projection under the Sort is evaluated twice per run
        // (measured at sf1: 6.7 s with the regex below vs the 2.8 s
        // regex scan itself). Sorting the raw (doc_id, text) rows and
        // projecting the cleanup afterwards keeps the output byte-
        // identical while the sampling pass only touches the scan.
        Tables.documents(s, d)
          .select(col("doc_id"),
            length(col("text")).cast("long").as("n_chars_raw"),
            col("text"))
          .orderBy(col("doc_id"))
          .select(col("doc_id"), col("n_chars_raw"),
            cleaned.as("clean_text"))
          .withColumn("n_chars_clean",
            length(col("clean_text")).cast("long"))
      },
      Some("""SELECT doc_id, length(text) AS n_chars_raw,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 .,!?'']', ' ', 'g'), '\s+', ' ', 'g'))
        |    AS clean_text,
        |  length(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 .,!?'']', ' ', 'g'), '\s+', ' ', 'g')))
        |    AS n_chars_clean
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // CORPUS-LM QUALITY SCORE — the perplexity proxy: per-doc mean
    // unigram surprisal (−ln p(token)) under the corpus's own unigram
    // distribution. Two aggregations sharing the token layout (corpus
    // frequencies, then per-doc mean via a broadcast-sized frequency
    // join — vocab ≪ corpus at any scale). Double-sum order would
    // break hash parity, so each surprisal term is rounded to 6
    // decimals and summed as EXACT DECIMAL; only the final mean
    // divides as double.
    Q("text_unigram_logprob",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
        val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .cache()
        // total tokens from the vocab-sized aggregate (no second
        // corpus scan); driver scalar, bounded by construction
        val total = freq.agg(sum(col("cnt"))).head().getLong(0)
        toks.join(broadcast(freq), Seq("tok"))
          .select(col("doc_id"),
            round(-log(col("cnt").cast("double") / lit(total.toDouble)),
              6).cast("decimal(18,6)").as("surprisal"))
          .groupBy("doc_id")
          .agg((sum(col("surprisal")).cast("double") /
            count(lit(1))).as("mean_surprisal"),
            count(lit(1)).as("n_tok"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        | total AS (SELECT count(*) AS n FROM toks)
        |SELECT doc_id,
        |  CAST(sum(CAST(round(-ln(CAST(cnt AS DOUBLE) / n), 6)
        |           AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |    AS mean_surprisal,
        |  count(*) AS n_tok
        |FROM toks JOIN freq USING (tok), total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("text_tokens",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_ws_tokens"),
          size(TextAnalysis.subwordPieces(col("text"))).cast("long")
            .as("n_subword"),
          length(col("text")).cast("long").as("n_chars_text"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS n_subword,
        |  length(text) AS n_chars_text
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: stopword ratio + length gate.
    Q("text_quality",
      (s, d) => {
        val stats = TextAnalysis.tokenStats(Tables.documents(s, d))
        Tables.documents(s, d).join(stats, Seq("doc_id"))
          .select(col("doc_id"), col("n_tok"), col("n_stop"),
            (col("n_stop").cast("double") / col("n_tok").cast("double"))
              .as("stop_ratio"),
            col("n_chars").between(50L, 5000L).as("len_ok"))
          .withColumn("quality_ok",
            col("len_ok") && col("stop_ratio") <= 0.6)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | a AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |         count(CASE WHEN tok IN
        |           ('the','a','an','of','and','to','in','is','it','for')
        |           THEN 1 END) AS n_stop
        |  FROM t GROUP BY doc_id)
        |SELECT d.doc_id, n_tok, n_stop,
        |  CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
        |  d.n_chars BETWEEN 50 AND 5000 AS len_ok,
        |  (d.n_chars BETWEEN 50 AND 5000)
        |    AND CAST(n_stop AS DOUBLE) / n_tok <= 0.6 AS quality_ok
        |FROM a JOIN documents d USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // Content fingerprints: full digest + min-shingle (1-perm MinHash).
    Q("text_fingerprint",
      (s, d) => TextAnalysis.fingerprints(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id, md5(text) AS fp_full,
        |  list_min([md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |            FOR i IN generate_series(1, len(t) - 2)])
        |    AS fp_minshingle
        |FROM toks ORDER BY doc_id""".stripMargin)),

    // Language ID — heuristic profiles; engine-specific scoring, so
    // rows-only for the driver; accuracy asserted in ScalaTest on real
    // per-language sentences.
    Q("text_langid",
      (s, d) => TextAnalysis.languageId(Tables.documents(s, d))
        .select("doc_id", "pred_lang", "pred_score")
        .orderBy(col("doc_id")),
      // the heuristic is pure ratio arithmetic + a fixed-order
      // strict-greater argmax — DuckDB replays it bit-for-bit (scores
      // are integer ratios, shipped unrounded per the round() rule)
      Some("""WITH t AS (
        |  SELECT doc_id, text,
        |         string_split(lower(text), ' ') AS toks
        |  FROM documents),
        | s AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> x IN
        |      ('the','and','of','to','is','you','that','it'))) AS DOUBLE)
        |      / greatest(len(toks), 1) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN
        |      ('der','die','das','und','ist','nicht','ich','ein'))) AS DOUBLE)
        |      / greatest(len(toks), 1) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN
        |      ('el','la','los','las','es','una','que','por'))) AS DOUBLE)
        |      / greatest(len(toks), 1) AS s_es,
        |    CAST(len(list_filter(toks, x -> x IN
        |      ('le','la','les','est','une','des','que','dans'))) AS DOUBLE)
        |      / greatest(len(toks), 1) AS s_fr,
        |    CAST(length(text) -
        |         length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '',
        |                               'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS s_zh
        |  FROM t),
        | f1 AS (SELECT *,
        |   CASE WHEN s_de > s_en THEN s_de ELSE s_en END AS b1s,
        |   CASE WHEN s_de > s_en THEN 'de' ELSE 'en' END AS b1l FROM s),
        | f2 AS (SELECT *,
        |   CASE WHEN s_es > b1s THEN s_es ELSE b1s END AS b2s,
        |   CASE WHEN s_es > b1s THEN 'es' ELSE b1l END AS b2l FROM f1),
        | f3 AS (SELECT *,
        |   CASE WHEN s_fr > b2s THEN s_fr ELSE b2s END AS b3s,
        |   CASE WHEN s_fr > b2s THEN 'fr' ELSE b2l END AS b3l FROM f2),
        | f4 AS (SELECT *,
        |   CASE WHEN s_zh > b3s THEN s_zh ELSE b3s END AS b4s,
        |   CASE WHEN s_zh > b3s THEN 'zh' ELSE b3l END AS b4l FROM f3)
        |SELECT doc_id,
        |  CASE WHEN b4s > 0.0 THEN b4l ELSE 'unknown' END AS pred_lang,
        |  b4s AS pred_score
        |FROM f4 ORDER BY doc_id""".stripMargin)),

    // Exact dedup over planted exact copies.
    Q("dedup_exact",
      (s, d) => Dedup.exact(plantedDocs(s, d))
        .select("rep_id", "n_copies")
        .orderBy(col("rep_id")),
      Some(s"""$plantedCte
        |SELECT min(doc_id) AS rep_id, count(*) AS n_copies
        |FROM docs GROUP BY md5(text)
        |ORDER BY rep_id""".stripMargin)),

    // n-gram (3-shingle) Jaccard near-dup pairs. Cost-based physical
    // choice: naive inverted-index join at small volume, PPJoin-style
    // prefix filtering in the 100 TB regime — identical results either
    // way (ScaleSpec proves equivalence).
    Q("dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardAuto(plantedDocs(s, d),
          k = 3, threshold = 0.8)
        .orderBy(col("a_id"), col("b_id")),
      Some(s"""$plantedCte,
        | toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        | sh AS (SELECT DISTINCT doc_id,
        |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                  FOR i IN generate_series(1, len(t) - 2)]) AS shingle
        |        FROM toks),
        | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | common AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT a_id, b_id, n_common,
        |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.doc_id = a_id
        |JOIN sizes sb ON sb.doc_id = b_id
        |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin)),

    // MinHash + LSH banding, FULL ORACLE: md5-seeded permutations make
    // every signature value, band bucket, and estimated jaccard
    // replayable in portable SQL (the production xxhash64 path stays in
    // Dedup.minHashLshPairs, pinned equivalent by MinHashExpressionSpec
    // and recall-asserted in DedupSpec).
    Q("dedup_minhash",
      (s, d) => Dedup.minHashLshPairsMd5(plantedDocs(s, d),
          numHashes = 16, bands = 4, k = 3, threshold = 0.7)
        .orderBy(col("a_id"), col("b_id")),
      Some(s"""$plantedCte,
        | toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        | sh AS (SELECT DISTINCT doc_id,
        |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                  FOR i IN generate_series(1, len(t) - 2)]) AS s
        |        FROM toks WHERE len(t) >= 3),
        | slist AS (SELECT doc_id, list(s) AS ss FROM sh GROUP BY doc_id),
        | sigs AS (SELECT doc_id,
        |            [list_min(list_transform(ss, x ->
        |               md5(CAST(i AS VARCHAR) || ':' || x)))
        |             FOR i IN generate_series(0, 15)] AS sig
        |          FROM slist),
        | banded AS (SELECT doc_id, sig, band,
        |              md5(array_to_string(sig[band*4+1:band*4+4], ','))
        |                AS bucket
        |            FROM sigs, generate_series(0, 3) g(band)),
        | cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |            a.sig AS sa, b.sig AS sb
        |          FROM banded a JOIN banded b
        |            ON a.band = b.band AND a.bucket = b.bucket
        |           AND a.doc_id < b.doc_id),
        | est AS (SELECT a_id, b_id,
        |           CAST(len(list_filter(generate_series(1, 16),
        |             i -> sa[i] = sb[i])) AS DOUBLE) / 16 AS est_jaccard
        |         FROM cand)
        |SELECT a_id, b_id, est_jaccard FROM est
        |WHERE est_jaccard >= 0.7 ORDER BY a_id, b_id""".stripMargin)),

    // SimHash banding + Hamming verify, FULL ORACLE: md5 token hashes
    // with the digest as a '0'/'1' bit string — DuckDB replays bit
    // extraction via get_bit(unhex(md5(t))::BIT, b). The xxhash64
    // one-long digest stays the production path (SimHashExpressionSpec
    // + DedupSpec recall).
    Q("dedup_simhash",
      (s, d) => Dedup.simHashPairsMd5(plantedDocs(s, d), maxHamming = 3)
        .orderBy(col("a_id"), col("b_id")),
      // SCALE-SURVIVABLE replay, round three (r8's vocab-level weight
      // form still disk-died at sf10: `tokc JOIN tbit × 64` is a
      // 2×10⁹-row intermediate dragging a 64-element list payload
      // through one hash aggregate). The ±1 bit sums are restated
      // with ZERO row blowup: each vocab token's 64 weight bits pack
      // into one UBIGINT (tbitu, still one md5 per vocab entry), and
      // all 64 sums compute as 64 aggregate COLUMNS in a single pass
      // over the 33M-row tokc join — s_b = 2·Σc·bit_b − Σc, so
      // sign(s_b) = (2·c_b − n > 0). Identical signatures; 151 s at
      // sf10 where the ×64 expansion exhausted the sandbox disk;
      // hash-verified at sf0.01 and vs the engine result at sf10.
      Some(s"""$plantedCte,
        | tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |         FROM docs),
        | tokc AS (SELECT doc_id, t, count(*) AS c FROM tok
        |          GROUP BY doc_id, t),
        | tbit AS (SELECT t,
        |            [CASE WHEN get_bit(unhex(md5(t))::BIT,
        |                              CAST(b AS INTEGER)) = 1
        |                  THEN 1 ELSE -1 END
        |             FOR b IN generate_series(0, 63)] AS ws
        |          FROM (SELECT DISTINCT t FROM tokc)),
        | tbitu AS MATERIALIZED (
        |  SELECT t, CAST(list_sum(
        |    [CAST((ws[i] + 1) // 2 AS UBIGINT) * (1::UBIGINT << (i - 1))
        |     FOR i IN generate_series(1, 64)]) AS UBIGINT) AS u
        |  FROM tbit),
        | bits64 AS (
        |  SELECT doc_id, sum(c) AS n,
        |   ${(0 until 64).map(b =>
             s"sum(c * CAST((u >> $b) & 1 AS BIGINT)) AS c$b")
             .mkString(",\n        |   ")}
        |  FROM tokc JOIN tbitu USING (t) GROUP BY doc_id),
        | sig AS (SELECT doc_id,
        |   ${(0 until 64).map(b =>
             s"CASE WHEN 2 * c$b - n > 0 THEN '1' ELSE '0' END")
             .mkString(" ||\n        |   ")} AS h
        |  FROM bits64),
        | banded AS (SELECT doc_id, h, band,
        |              substr(h, band*16 + 1, 16) AS bucket
        |            FROM sig, generate_series(0, 3) g(band)),
        | cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |            a.h AS ha, b.h AS hb
        |          FROM banded a JOIN banded b
        |            ON a.band = b.band AND a.bucket = b.bucket
        |           AND a.doc_id < b.doc_id),
        | ham AS (SELECT a_id, b_id,
        |           CAST(len(list_filter(generate_series(1, 64),
        |             i -> ha[i] <> hb[i])) AS BIGINT) AS hamming
        |         FROM cand)
        |SELECT a_id, b_id, hamming FROM ham
        |WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin)),

    // Duplicate-CLUSTER formation: connected components over the
    // jaccard pair list (min reachable id = cluster id) via iterative
    // label propagation — the step that turns pairwise dedup output
    // into "keep one representative per cluster". The result is
    // algorithm-independent, so the oracle states it as a recursive
    // reachability query.
    // CROSS-CORPUS DEDUP — dedup a NEWLY INGESTED shard against the
    // existing corpus (the incremental path continuous pipelines run):
    // incoming docs probe the existing corpus's inverted shingle
    // index; pairs form only across the boundary, never within the
    // union, so the standing index is reusable and the probe cost
    // scales with the shard. Exact copies surface at jaccard 1.0, the
    // one-token-appended near copies just under.
    Q("dedup_cross_corpus",
      (s, d) => {
        val existing = Tables.documents(s, d).select("doc_id", "text")
        val incoming = existing.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionAll(existing.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" qq17")).as("text")))
        Dedup.crossCorpusPairs(existing, incoming, k = 3,
            threshold = 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(crossBoundaryOracle)),

    // PERSISTED DEDUP INDEX, build-once/probe-many: the standing
    // corpus's inverted shingle index (postings + sizes + df, versioned
    // with the same _CURRENT pointer-flip protocol as the IVF index)
    // is built on disk, then the incoming shard probes the ARTIFACT —
    // corpus-side shingling/sizing is read, never recomputed. Same
    // plant and same oracle as dedup_cross_corpus: the persisted path
    // must give bit-identical pairs to the recompute path.
    Q("dedup_index_probe",
      (s, d) => {
        val idxDir = QueryPack.scratch("shingle_idx", d)
        val existing = Tables.documents(s, d).select("doc_id", "text")
        val incoming = existing.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionAll(existing.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" qq17")).as("text")))
        Dedup.buildShingleIndex(existing, idxDir)
        Dedup.probeShingleIndex(idxDir, incoming, k = 3, threshold = 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(crossBoundaryOracle)),

    // INCREMENTAL ingest for the persisted dedup index — the text
    // mirror of sim_ann_ivf_append: build the standing index on 2/3 of
    // the corpus, APPEND the remaining third as a delta segment (its
    // postings bucketed exactly like the base build's, `segments`
    // manifest + one atomic pointer flip — I/O ∝ |delta|, never a
    // rebuild), then probe. The probe fans out across the manifest's
    // segments (per-segment zero-Exchange pair joins; a doc lives
    // wholly in one segment so the union of per-segment pairs is
    // exact), and since the post-append index holds the full corpus
    // the same cross-boundary oracle replays it flat — the segmented
    // read path hash-verifies against the single-table recompute.
    Q("dedup_index_append",
      (s, d) => {
        val idxDir = QueryPack.scratch("shingle_append", d)
        val existing = Tables.documents(s, d).select("doc_id", "text")
        val incoming = existing.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionAll(existing.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" qq17")).as("text")))
        Dedup.buildShingleIndex(
          existing.filter(col("doc_id") % 3 =!= 0), idxDir)
        Dedup.appendShingleIndex(idxDir,
          existing.filter(col("doc_id") % 3 === 0))
        Dedup.probeShingleIndex(idxDir, incoming, k = 3, threshold = 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(crossBoundaryOracle)),

    // STREAMING corpus ingest into the standing dedup index — the
    // text mirror of sim_stream_ivf_ingest: document micro-batches
    // append delta segments through foreachBatch under the real
    // Structured Streaming scheduler, batchId-tagged so a
    // checkpoint-replayed batch no-ops instead of duplicating a
    // segment. Docs are whole per batch, so the probe's per-segment
    // pair union is batch-split-invariant: streamed ingest ≡ flat
    // append ≡ rebuilt index, and the same cross-boundary oracle
    // replays the post-shutdown probe against the flat recompute.
    Q("dedup_stream_ingest",
      (s, d) => {
        import org.apache.hadoop.fs.Path
        val root = QueryPack.scratch("shingle_stream", d)
        val fs = new Path(root).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val idxDir = s"$root/index"
        val existing = Tables.documents(s, d).select("doc_id", "text")
        val incoming = existing.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionAll(existing.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" qq17")).as("text")))
        Dedup.buildShingleIndex(
          existing.filter(col("doc_id") % 3 =!= 0), idxDir)
        val delta = existing.filter(col("doc_id") % 3 === 0)
        // several source files + maxFilesPerTrigger → a REAL multi-
        // micro-batch run (cf. sim_stream_ivf_ingest)
        delta.repartition(4).write.mode("overwrite")
          .parquet(s"$root/in")
        val s2 = QueryPack.streamSession(s, 8, s"$root/cp")
        val q = s2.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/in")
          .writeStream
          .option("checkpointLocation", s"$root/cp")
          .foreachBatch(Dedup.shingleStreamSink(idxDir, s"$root/cp"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        Dedup.probeShingleIndex(idxDir, incoming, k = 3, threshold = 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(crossBoundaryOracle)),

    // COMPACTION for the standing dedup index — the third verb of the
    // lifecycle (build/append/compact, the LSM minor-compaction role):
    // appends keep ingest ∝ |delta| but each adds a segment the probe
    // fans out over, and after N appends that per-segment fixed cost
    // dominates probe latency. Build on 2/3 of the corpus, append the
    // last third as TWO delta segments, COMPACT the three-segment
    // chain back into one bucketed segment (reads index files only —
    // no re-shingling; summed-across-segments df ≡ the compacted
    // segment's recomputed df for disjoint docs), then probe. The
    // post-compact index holds the full corpus in one segment, so the
    // same cross-boundary oracle replays it flat — and the probe is
    // bit-identical to the segmented path dedup_index_append verifies.
    Q("dedup_index_compact",
      (s, d) => {
        val idxDir = QueryPack.scratch("shingle_compact", d)
        val existing = Tables.documents(s, d).select("doc_id", "text")
        val incoming = existing.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionAll(existing.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" qq17")).as("text")))
        Dedup.buildShingleIndex(
          existing.filter(col("doc_id") % 3 =!= 0), idxDir)
        Dedup.appendShingleIndex(idxDir,
          existing.filter(col("doc_id") % 6 === 0))
        Dedup.appendShingleIndex(idxDir,
          existing.filter(col("doc_id") % 6 === 3))
        Dedup.compactShingleIndex(s, idxDir)
        Dedup.probeShingleIndex(idxDir, incoming, k = 3, threshold = 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(crossBoundaryOracle)),

    // SELF-MAINTAINING STREAMING INGEST: dedup_stream_ingest plus the
    // operational policy — the sink folds the chain via
    // compactShingleIndex whenever it exceeds maxSegments=2, so probe
    // latency stays at fresh-build shape however long the stream runs
    // (unmaintained, per-segment fixed cost grows without bound). The
    // fold runs AFTER each append commits (data + exactly-once tag
    // already on the chain; crash loses only maintenance) and carries
    // the folded tags in _TAGS, so checkpoint replays still no-op.
    // Result is fold-invariant — the same cross-boundary oracle
    // replays it flat; MaintainedIngestSpec pins the chain bound and
    // post-fold replay idempotence the oracle can't see.
    Q("dedup_stream_maintain",
      (s, d) => {
        import org.apache.hadoop.fs.Path
        val root = QueryPack.scratch("shingle_maintain", d)
        val fs = new Path(root).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        fs.delete(new Path(root), true)
        val idxDir = s"$root/index"
        val existing = Tables.documents(s, d).select("doc_id", "text")
        val incoming = existing.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionAll(existing.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" qq17")).as("text")))
        Dedup.buildShingleIndex(
          existing.filter(col("doc_id") % 3 =!= 0), idxDir)
        val delta = existing.filter(col("doc_id") % 3 === 0)
        // 4 source files, 1 per trigger → 4 real micro-batches, so the
        // unmaintained chain would reach 5 segments; the threshold
        // forces ≥2 folds mid-stream
        delta.repartition(4).write.mode("overwrite")
          .parquet(s"$root/in")
        val s2 = QueryPack.streamSession(s, 8, s"$root/cp")
        val q = s2.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
          .writeStream
          .option("checkpointLocation", s"$root/cp")
          .foreachBatch(Dedup.shingleStreamSink(idxDir, s"$root/cp",
            maxSegments = 2))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        Dedup.probeShingleIndex(idxDir, incoming, k = 3, threshold = 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(crossBoundaryOracle)),

    // INDEX DESCRIBE: the observability verb of the standing-index
    // lifecycle — one row per segment of the committed version with
    // the populations an operator sizes probes and schedules
    // compaction by (docs, postings, distinct shingles, doc-id
    // range). The engine reads ONLY the index's small side files
    // (sizes + dfreq — sum(n_sh) IS the postings count by
    // construction); the oracle recomputes every number from the raw
    // documents table with the same split predicates, so a pass
    // proves the persisted metadata tracks the corpus exactly. Doc
    // counts are over SHINGLE-BEARING docs only (>= k tokens) on both
    // sides — a shorter doc carries no shingles, is absent from the
    // index's sizes file, and is invisible to every probe, so
    // describe reporting it would overstate the index population.
    Q("dedup_index_describe",
      (s, d) => {
        val idxDir = QueryPack.scratch("shingle_describe", d)
        val existing = Tables.documents(s, d).select("doc_id", "text")
        Dedup.buildShingleIndex(
          existing.filter(col("doc_id") % 3 =!= 0), idxDir)
        Dedup.appendShingleIndex(idxDir,
          existing.filter(col("doc_id") % 3 === 0))
        Dedup.describeShingleIndex(s, idxDir).orderBy(col("seg_ord"))
      },
      Some("""WITH segs AS (
        |  SELECT CASE WHEN doc_id % 3 <> 0 THEN 0 ELSE 1 END AS seg_ord,
        |         doc_id, text FROM documents),
        | t AS (SELECT seg_ord, doc_id, string_split(text, ' ') AS t
        |       FROM segs),
        | sh AS (SELECT DISTINCT seg_ord, doc_id,
        |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                  FOR i IN generate_series(1, len(t) - 2)])
        |            AS shingle
        |        FROM t),
        | post AS (SELECT seg_ord, count(*) AS n_postings,
        |                 count(DISTINCT shingle) AS n_shingles
        |          FROM sh GROUP BY 1),
        | d AS (SELECT seg_ord, count(*) AS n_docs,
        |              min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |       FROM t WHERE len(t) >= 3 GROUP BY 1)
        |SELECT d.seg_ord, n_docs, n_postings, n_shingles,
        |       min_doc, max_doc
        |FROM d JOIN post USING (seg_ord)
        |ORDER BY seg_ord""".stripMargin)),

    // INDEX SEARCH: grep the corpus through the standing shingle
    // index instead of scanning it. The needle (a 5-token phrase
    // lifted deterministically from the corpus so it exists at every
    // SF) maps to its shingle hashes via the SAME kernel that built
    // the index; candidates come from the postings of just those
    // hashes (pushed IN filter + per-bucket shingle sort = row-group
    // pruning), and only the broadcast-small candidate set verifies
    // against the documents table. The oracle greps the raw corpus
    // with the identical substring-at-token-boundary predicate, so a
    // pass proves the index-candidate path loses nothing vs the full
    // scan it replaces.
    Q("text_index_search",
      (s, d) => {
        val idxDir = QueryPack.scratch("shingle_search", d)
        val docs = Tables.documents(s, d).select("doc_id", "text")
        Dedup.buildShingleIndex(
          docs.filter(col("doc_id") % 3 =!= 0), idxDir)
        Dedup.appendShingleIndex(idxDir,
          docs.filter(col("doc_id") % 3 === 0))
        // the needle: the corpus's most DOCUMENT-FREQUENT 5-token
        // window (ties broken by lowest carrying doc, then text) —
        // data-derived so it exists at every SF, and near-dup
        // replicas share token runs, so the match set is the largest
        // any 5-token needle can have (3 docs at sf0.01). Needle
        // selection scans the corpus once; the operator under test
        // does not.
        val phrase = docs
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 8)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(t)-5), " +
              "i -> concat_ws(' ', slice(t, i+1, 5)))")).as("w"))
          .distinct()
          .groupBy("w").agg(count(lit(1)).as("n"),
            min("doc_id").as("rep"))
          .orderBy(desc("n"), asc("rep"), asc("w")).limit(1)
          .head().getString(0)
        DynamicOracle.put("text_index_search",
          s"""SELECT doc_id FROM documents
            |WHERE position(' ${phrase.replace("'", "''")} ' IN
            |               ' ' || text || ' ') > 0
            |ORDER BY doc_id""".stripMargin)
        Dedup.searchShingleIndex(s, idxDir, phrase, docs)
          .orderBy("doc_id")
      },
      None),

    // TRAINING-MIX SAMPLING: select documents per language up to a
    // token budget, in a deterministic pseudo-random order (md5 of the
    // doc id — an unbiased shuffle any engine replays). The exact
    // formulation is a per-language ordered prefix sum; at 100 TB the
    // same selection runs as two passes with no global per-lang sort:
    // sample the per-lang tokens-vs-hash CDF, pick each lang's hash
    // threshold, then filter (one scan, embarrassingly parallel) —
    // the window form here doubles as that plan's exactness oracle.
    Q("pipeline_mixture_sample",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long")
              .as("n_tok"))
          .withColumn("cum_tokens", sum(col("n_tok")).over(w))
          .filter(col("cum_tokens") <= 5000L)
          .select("lang", "doc_id", "n_tok", "cum_tokens")
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        | ranked AS (
        |  -- CAST: DuckDB sums BIGINT into HUGEINT; Spark stays BIGINT
        |  SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_tokens
        |  FROM toks)
        |SELECT lang, doc_id, n_tok, cum_tokens FROM ranked
        |WHERE cum_tokens <= 5000 ORDER BY lang, doc_id""".stripMargin)),

    // DEDUP APPLIED end-to-end: near-dup clusters → keep the min-id
    // representative per cluster → anti-join the removal list back
    // onto the corpus → per-source survivor rollup (planted copies
    // trace to their source document's metadata via the id offset).
    // This is the step that turns pairwise dedup output into the
    // actual training corpus; the anti-join is a broadcast (removal
    // lists are ≪ corpus by construction).
    Q("pipeline_dedup_apply",
      (s, d) => {
        val planted = plantedDocs(s, d)
        val removed = Dedup.dupClusters(
            Dedup.ngramJaccardPairs(planted, k = 3,
              threshold = 0.8, maxPostings = Int.MaxValue))
          .filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("removed_id"))
        val survivors = planted.join(broadcast(removed),
          planted("doc_id") === removed("removed_id"), "left_anti")
        survivors
          .select((col("doc_id") % 1000000L).as("orig_id"))
          .join(Tables.documents(s, d).select(
            col("doc_id").as("orig_id"), col("source"), col("n_chars")),
            Seq("orig_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"))
      },
      // MATERIALIZED on sh/edges is what makes this replayable at
      // replica scale: the recursive `reach` term references `edges`,
      // and an inlined CTE is RE-EVALUATED on every recursion
      // iteration — each re-running the 32M-row shingle self-join,
      // whose cumulative spill exceeded the sandbox disk at sf10.
      // Materialized, the replay is 48 s; identical results.
      Some(plantedCte.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        | toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        | sh AS MATERIALIZED (SELECT DISTINCT doc_id,
        |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                  FOR i IN generate_series(1, len(t) - 2)]) AS shingle
        |        FROM toks),
        | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | common AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        | pairs AS (
        |  SELECT a_id, b_id FROM common
        |  JOIN sizes sa ON sa.doc_id = a_id
        |  JOIN sizes sb ON sb.doc_id = b_id
        |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
        |        >= 0.8),
        | edges AS MATERIALIZED (
        |           SELECT a_id AS src, b_id AS dst FROM pairs
        |           UNION SELECT b_id, a_id FROM pairs),
        | reach AS (
        |  SELECT src AS id, src AS lbl FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
        | removed AS (
        |  SELECT id AS doc_id FROM reach
        |  GROUP BY id HAVING id <> min(lbl)),
        | survivors AS (
        |  SELECT d.doc_id FROM docs d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM removed))
        |-- CAST: DuckDB sums BIGINT into HUGEINT; Spark stays BIGINT
        |SELECT m.source, count(*) AS n_docs,
        |       CAST(sum(m.n_chars) AS BIGINT) AS sum_chars
        |FROM survivors s
        |JOIN documents m ON m.doc_id = s.doc_id % 1000000
        |GROUP BY m.source ORDER BY m.source""".stripMargin)),

    Q("dedup_clusters",
      (s, d) => Dedup.dupClusters(
          Dedup.ngramJaccardPairs(plantedDocs(s, d), k = 3,
            threshold = 0.8, maxPostings = Int.MaxValue))
        .orderBy(col("doc_id")),
      // sh/edges MATERIALIZED for the same reason as
      // pipeline_dedup_apply: the recursive reach term would otherwise
      // re-evaluate the shingle self-join every iteration.
      Some(plantedCte.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        | toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        | sh AS MATERIALIZED (SELECT DISTINCT doc_id,
        |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                  FOR i IN generate_series(1, len(t) - 2)]) AS shingle
        |        FROM toks),
        | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | common AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
        |  FROM sh a JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        | pairs AS (
        |  SELECT a_id, b_id FROM common
        |  JOIN sizes sa ON sa.doc_id = a_id
        |  JOIN sizes sb ON sb.doc_id = b_id
        |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
        |        >= 0.8),
        | edges AS MATERIALIZED (
        |           SELECT a_id AS src, b_id AS dst FROM pairs
        |           UNION SELECT b_id, a_id FROM pairs),
        | reach AS (
        |  SELECT src AS id, src AS lbl FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id)
        |SELECT id AS doc_id, min(lbl) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // EXACT SUBSTRING DEDUP (the Lee et al. 2022 semantic, stride-
    // sampled): hash fixed-width char windows (40 chars, stride 10) of
    // every doc, count distinct docs per window hash, then score each
    // doc by the fraction of its windows that also occur in ANOTHER
    // doc. Docs past a threshold are the "contains duplicated text"
    // drop set. Two shuffles, both on uniform hash keys: window-hash →
    // doc-count (map-side partial), then doc_id → fraction. The stride
    // bounds blowup at 1/10th of the suffix-array formulation, and the
    // per-hash postings are capped by the duplication factor, never
    // corpus size. dup_frac ships as a RAW integer ratio (bit-portable
    // division; never rounded — Q's round caveat).
    Q("text_substring_dedup",
      (s, d) => {
        val docs = plantedDocs(s, d).filter(length(col("text")) >= 40)
        val wins = docs
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), length(col("text")) - 39, lit(10)))
              .as("o"))
          .select(col("doc_id"),
            md5(col("text").substr(col("o"), lit(40))).as("whash"))
        // countDistinct (streaming agg), NOT collect_list: a boilerplate
        // window (license header, nav chrome) can occur in 10% of a
        // 100 TB corpus — a per-hash list would OOM; a distinct-count +
        // join back stays bounded and AQE skew-splits the hot hash.
        val perHash = wins.groupBy(col("whash"))
          .agg(countDistinct(col("doc_id")).as("n_docs"))
        wins.join(perHash, Seq("whash"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_windows"),
            sum(when(col("n_docs") >= 2, 1L).otherwise(0L))
              .as("n_dup_windows"))
          .withColumn("dup_frac",
            col("n_dup_windows").cast("double") / col("n_windows"))
          .withColumn("drop_doc", col("dup_frac") >= 0.5)
          .orderBy(col("doc_id"))
      },
      Some(s"""$plantedCte,
        | docs40 AS (SELECT doc_id, text FROM docs
        |            WHERE length(text) >= 40),
        | wins AS (
        |  SELECT doc_id,
        |    md5(substring(text, CAST(o AS INTEGER), 40)) AS whash
        |  FROM docs40, LATERAL (SELECT
        |    unnest(generate_series(1, length(text) - 39, 10)) AS o) t),
        | byh AS (SELECT whash, count(DISTINCT doc_id) AS n_docs
        |         FROM wins GROUP BY whash)
        |SELECT w.doc_id, count(*) AS n_windows,
        |  CAST(sum(CASE WHEN b.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_windows,
        |  CAST(sum(CASE WHEN b.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS dup_frac,
        |  CAST(sum(CASE WHEN b.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) >= 0.5 AS drop_doc
        |FROM wins w JOIN byh b USING (whash)
        |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin)),

    // BM25 RETRIEVAL over the corpus for a literal query ("dup window
    // hash" — one rare term, df=25/500, two common ones), the ranking
    // function behind every retrieval-augmented data pipeline. Shape:
    // one token explode → per-doc lengths (map-side partial agg);
    // query-term postings filtered BEFORE any shuffle (predicate on the
    // exploded token), so the scored set is |postings(q)|, not the
    // corpus; document-frequency aggregate is query-terms-sized and
    // broadcast back. Corpus scalars (N, total length) are two driver
    // longs. Per-term scores round at 6dp into exact DECIMAL partial
    // sums (irrational family — ln/ratio mix — so rounding is portable;
    // Q's caveat), then one exact sum per doc and a top-20
    // TakeOrderedAndProject, never a full sort.
    Q("text_bm25",
      (s, d) => {
        val terms = Seq("dup", "window", "hash")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
        val dls = toks.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("dl")).cache()
        val corpus = dls.agg(sum(col("dl")), count(lit(1))).head()
        val (total, nDocs) = (corpus.getLong(0), corpus.getLong(1))
        val tfs = toks.filter(col("tok").isin(terms: _*))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val dfs = tfs.groupBy(col("tok"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val idf = log(lit(1.0) +
          (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        val tfNorm = (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
            lit(0.75) * (col("dl").cast("double") * lit(nDocs) /
              lit(total))))
        tfs.join(broadcast(dfs), Seq("tok"))
          .join(dls, Seq("doc_id"))
          .select(col("doc_id"),
            round(idf * tfNorm, 6).cast("decimal(18,6)").as("sc"))
          .groupBy(col("doc_id"))
          .agg(sum(col("sc")).cast("double").as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        | corpus AS (SELECT sum(dl) AS total, count(*) AS n FROM dls),
        | tfs AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |         WHERE tok IN ('dup', 'window', 'hash')
        |         GROUP BY doc_id, tok),
        | dfs AS (SELECT tok, count(DISTINCT doc_id) AS df
        |         FROM tfs GROUP BY tok),
        | scored AS (
        |  SELECT doc_id,
        |    CAST(round(
        |      ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
        |      ((CAST(tf AS DOUBLE) * 2.2) /
        |       (CAST(tf AS DOUBLE) + 1.2 * (0.25 +
        |        0.75 * (CAST(dl AS DOUBLE) * n / total)))), 6)
        |      AS DECIMAL(18,6)) AS sc
        |  FROM tfs JOIN dfs USING (tok) JOIN dls USING (doc_id), corpus)
        |SELECT doc_id, CAST(sum(sc) AS DOUBLE) AS bm25
        |FROM scored GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)),

    // THE FULL CORPUS BUILD, end to end in ONE oracled query — the
    // pipeline a user actually runs: quality gate → exact dedup →
    // decontaminate against the eval set → deterministic 12/16 sample
    // → shard, with per-shard doc/token accounting. Every stage is the
    // already-verified pattern (clean_corpus's gate+reps,
    // decontaminate's md5 5-shingle broadcast semi-join, hash_split's
    // nibble sample, shuffle_shard's assignment); this row proves they
    // COMPOSE. Plan: per-row gates, two content-hash shuffles (reps,
    // shingle join vs a broadcast eval set), one shard rollup — the
    // corpus never joins anything its own size.
    Q("pipeline_full_build",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val stats = TextAnalysis.tokenStats(docs)
        val quality = docs.join(stats, Seq("doc_id"))
          .filter(col("n_chars").between(50L, 5000L) &&
            col("n_stop").cast("double") / col("n_tok").cast("double")
              <= 0.6 &&
            col("doc_id") >= 25)
        val reps = quality.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
        val deduped = quality.join(reps.select("doc_id"), Seq("doc_id"))
        def shingled(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"),
            explode(transform(TextAnalysis.shingles(col("toks"), 5),
              g => md5(g))).as("sh"))
        val bench = shingled(docs.filter(col("doc_id") < 25))
          .select("sh").distinct()
        val contaminated = shingled(deduped)
          .join(broadcast(bench), Seq("sh"))
          .select("doc_id").distinct()
        val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
        val dig = md5(col("doc_id").cast("string"))
        clean
          .withColumn("nib",
            conv(substring(dig, 1, 1), 16, 10).cast("int"))
          .withColumn("shard",
            conv(substring(dig, 2, 1), 16, 10).cast("int") % 4)
          .filter(col("nib") < 12)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy(col("shard"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | stats AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |    count(CASE WHEN tok IN
        |      ('the','a','an','of','and','to','in','is','it','for')
        |      THEN 1 END) AS n_stop
        |  FROM toks GROUP BY doc_id),
        | q AS (
        |  SELECT d.doc_id, d.text, s.n_tok
        |  FROM documents d JOIN stats s USING (doc_id)
        |  WHERE d.n_chars BETWEEN 50 AND 5000
        |    AND CAST(s.n_stop AS DOUBLE) / s.n_tok <= 0.6
        |    AND d.doc_id >= 25),
        | reps AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
        | dd AS (SELECT q.* FROM q JOIN reps USING (doc_id)),
        | sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(1, len(toks)-3)),
        |      i -> md5(array_to_string(toks[i:i+4], ' ')))) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)),
        | bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 25),
        | bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench b
        |         USING (sh) WHERE s.doc_id >= 25),
        | clean AS (
        |  SELECT dd.* FROM dd LEFT JOIN bad ON dd.doc_id = bad.doc_id
        |  WHERE bad.doc_id IS NULL),
        | sampled AS (
        |  SELECT *,
        |    strpos('0123456789abcdef',
        |           md5(CAST(doc_id AS VARCHAR))[1]) - 1 AS nib,
        |    (strpos('0123456789abcdef',
        |            md5(CAST(doc_id AS VARCHAR))[2]) - 1) % 4 AS shard
        |  FROM clean)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM sampled WHERE nib < 12
        |GROUP BY shard ORDER BY shard""".stripMargin)),

    // CURRICULUM / QUALITY-WEIGHTED SAMPLING — bucket the corpus into
    // quality quartiles (stopword-ratio score) and keep each bucket at
    // a different deterministic rate (16/16, 8/16, 4/16, 1/16 by md5
    // nibble): the standard quality-mix knob for training corpora,
    // reproducible on any engine/layout. ntile here is the EXACTNESS
    // form (global-order window — single reducer); the stated 100 TB
    // plan, as with pipeline_mixture_sample: derive the three quartile
    // THRESHOLDS from a quantile summary (driver-side KBs), then one
    // embarrassingly-parallel filter scan — same output, no global
    // window. The oracle pins the semantics either plan must produce.
    Q("pipeline_curriculum_sample",
      (s, d) => {
        val stats = TextAnalysis.tokenStats(Tables.documents(s, d))
        val scored = Tables.documents(s, d).join(stats, Seq("doc_id"))
          .select(col("doc_id"), col("n_tok"),
            (col("n_stop").cast("double") / col("n_tok").cast("double"))
              .as("stop_ratio"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("stop_ratio"), col("doc_id"))
        val nib = conv(substring(md5(col("doc_id").cast("string")), 1, 1),
          16, 10).cast("int")
        scored.withColumn("bucket", ntile(4).over(w))
          .withColumn("keep", nib <
            when(col("bucket") === 1, 16).when(col("bucket") === 2, 8)
              .when(col("bucket") === 3, 4).otherwise(1))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("keep"), col("n_tok"))).as("n_tokens_kept"))
          .orderBy(col("bucket"))
      },
      Some("""WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | a AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |         count(CASE WHEN tok IN
        |           ('the','a','an','of','and','to','in','is','it','for')
        |           THEN 1 END) AS n_stop
        |  FROM t GROUP BY doc_id),
        | s AS (SELECT doc_id, n_tok,
        |         CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio FROM a),
        | b AS (SELECT doc_id, n_tok,
        |         ntile(4) OVER (ORDER BY stop_ratio, doc_id) AS bucket,
        |         strpos('0123456789abcdef',
        |                md5(CAST(doc_id AS VARCHAR))[1]) - 1 AS nib
        |       FROM s),
        | k AS (SELECT *, nib < CASE bucket WHEN 1 THEN 16 WHEN 2 THEN 8
        |         WHEN 3 THEN 4 ELSE 1 END AS keep FROM b)
        |SELECT bucket, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN keep THEN n_tok END) AS BIGINT)
        |    AS n_tokens_kept
        |FROM k GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // PER-DOC LEXICAL ENTROPY + type-token ratio — the vocabulary-
    // diversity quality signals (low entropy = keyword stuffing /
    // boilerplate; low TTR = repetition). entropy = ln(n) − Σc·ln(c)/n
    // from per-(doc,token) counts: two shuffles, both partial-agg
    // combinable, zero joins. Per-term c·ln(c) rounds at 6dp into
    // exact DECIMAL partials (irrational family — portable), so the
    // sum is order-insensitive; TTR ships as the raw integer ratio.
    Q("text_entropy",
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("cnt"))
        tf.groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_tok"),
            count(lit(1)).as("n_types"),
            sum(round(col("cnt").cast("double") *
                log(col("cnt").cast("double")), 6)
              .cast("decimal(18,6)")).as("clogc"))
          .select(col("doc_id"), col("n_tok"), col("n_types"),
            (col("n_types").cast("double") / col("n_tok").cast("double"))
              .as("ttr"),
            round(log(col("n_tok").cast("double")) -
              col("clogc").cast("double") / col("n_tok").cast("double"),
              6).as("entropy_nats"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        | tf AS (SELECT doc_id, tok, count(*) AS cnt FROM toks
        |        GROUP BY doc_id, tok),
        | agg AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok,
        |    count(*) AS n_types,
        |    sum(CAST(round(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)),
        |             6) AS DECIMAL(18,6))) AS clogc
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tok, n_types,
        |  CAST(n_types AS DOUBLE) / CAST(n_tok AS DOUBLE) AS ttr,
        |  round(ln(CAST(n_tok AS DOUBLE)) -
        |        CAST(clogc AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
        |    AS entropy_nats
        |FROM agg ORDER BY doc_id""".stripMargin)),

    // DIRECTED CONTAINMENT dedup — catches a SHORT doc embedded in a
    // LONG one (quote farms, scrape chrome around an original), which
    // symmetric Jaccard misses because the long side dominates the
    // union. Planted: every 8th doc also appears wrapped in header/
    // footer chrome (+3M ids); the original is 100% contained in its
    // wrapped copy, never the reverse for short docs. containment is a
    // raw integer ratio (never rounded — bit-portable division). Same
    // inverted-index + postings-cap shape as ngram Jaccard: candidate
    // volume is Σ df², never all-pairs.
    Q("dedup_containment",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val wrapped = docs.filter(col("doc_id") % 8 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(lit("wraphdr alpha beta "), col("text"),
              lit(" gamma delta wrapftr")).as("text"))
        Dedup.containmentAuto(docs.unionAll(wrapped), k = 3,
            threshold = 0.9)
          .orderBy(col("a_id"), col("b_id"))
      },
      // SCALE-SURVIVABLE replay (the r8 halved-pairs form still died at
      // sf10: the wrap-chrome shingles sit in EVERY wrapped doc, df =
      // n/8, so the plain self-join enumerates Σdf² ≈ 4×10⁹ pairs —
      // the exact hot-key blowup the engine's prefix filter exists to
      // avoid). The replay splits shingles at df > 1024:
      //  - RARE shingles self-join normally (pair volume back to ~75M);
      //  - HOT shingles never join — each doc carries its (tiny) hot
      //    set as a list, and a candidate pair's exact hot overlap is
      //    list_intersect, so n_common = n_rare + |hot∩hot| exactly.
      // Completeness: a qualifying pair missing from the rare join
      // would need ≥90% of the contained doc's shingles hot — those
      // docs (`hotdocs`, empty in this corpus at every SF) get a
      // rescue pass over the hot postings, making the rewrite lossless
      // rather than assumption-bound. The candidate filter bounds the
      // true containment from above (least() on both the hot overlap
      // and the denominator), so no qualifier is pruned early. At
      // sf0.01 no shingle exceeds the threshold and the plan
      // degenerates to the original exact self-join. MATERIALIZED
      // keeps the multi-referenced CTEs from re-evaluating.
      // Hash-verified vs the engine at sf0.01 and sf10 (115 s vs
      // >60 GB disk death).
      Some("""WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000,
        |         'wraphdr alpha beta ' || text || ' gamma delta wrapftr'
        |  FROM documents WHERE doc_id % 8 = 0),
        | toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
        | sh AS MATERIALIZED (SELECT DISTINCT doc_id,
        |          unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                  FOR i IN generate_series(1, len(t) - 2)]) AS shingle
        |        FROM toks WHERE len(t) >= 3),
        | sizes AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | hot AS MATERIALIZED (
        |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1024),
        | shr AS MATERIALIZED (
        |  SELECT s.doc_id, s.shingle FROM sh s
        |  WHERE s.shingle NOT IN (SELECT shingle FROM hot)),
        | dochot AS MATERIALIZED (
        |  SELECT s.doc_id, list_sort(list(s.shingle)) AS hs,
        |         count(*) AS n_hot
        |  FROM sh s JOIN hot h USING (shingle) GROUP BY s.doc_id),
        | rarepairs AS MATERIALIZED (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_rare
        |  FROM shr a JOIN shr b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        | candpairs AS (
        |  SELECT r.a_id, r.b_id
        |  FROM rarepairs r
        |  JOIN sizes sa ON sa.doc_id = r.a_id
        |  JOIN sizes sb ON sb.doc_id = r.b_id
        |  LEFT JOIN dochot ha ON ha.doc_id = r.a_id
        |  LEFT JOIN dochot hb ON hb.doc_id = r.b_id
        |  WHERE CAST(r.n_rare + least(coalesce(ha.n_hot, 0),
        |                              coalesce(hb.n_hot, 0)) AS DOUBLE)
        |        / least(sa.n_sh, sb.n_sh) >= 0.9),
        | hotdocs AS (
        |  SELECT d.doc_id, d.hs FROM dochot d JOIN sizes s USING (doc_id)
        |  WHERE d.n_hot >= CAST(ceil(0.9 * s.n_sh) AS BIGINT)),
        | rescue AS (
        |  SELECT DISTINCT least(hd.doc_id, p.doc_id) AS a_id,
        |         greatest(hd.doc_id, p.doc_id) AS b_id
        |  FROM hotdocs hd
        |  JOIN (SELECT s.doc_id, s.shingle
        |        FROM sh s JOIN hot h USING (shingle)) p
        |    ON list_contains(hd.hs, p.shingle) AND p.doc_id <> hd.doc_id),
        | allcand AS (
        |  SELECT a_id, b_id FROM candpairs
        |  UNION
        |  SELECT a_id, b_id FROM rescue),
        | exact AS (
        |  SELECT c.a_id, c.b_id,
        |    coalesce(r.n_rare, 0) +
        |      len(list_intersect(coalesce(ha.hs, []), coalesce(hb.hs, [])))
        |      AS n_common,
        |    sa.n_sh AS na, sb.n_sh AS nb
        |  FROM allcand c
        |  LEFT JOIN rarepairs r ON r.a_id = c.a_id AND r.b_id = c.b_id
        |  JOIN sizes sa ON sa.doc_id = c.a_id
        |  JOIN sizes sb ON sb.doc_id = c.b_id
        |  LEFT JOIN dochot ha ON ha.doc_id = c.a_id
        |  LEFT JOIN dochot hb ON hb.doc_id = c.b_id),
        | common AS (
        |  SELECT a_id, b_id, n_common, na AS n_a FROM exact
        |  UNION ALL
        |  SELECT b_id, a_id, n_common, nb FROM exact)
        |SELECT a_id, b_id, n_common,
        |  CAST(n_common AS DOUBLE) / n_a AS containment
        |FROM common
        |WHERE CAST(n_common AS DOUBLE) / n_a >= 0.9
        |ORDER BY a_id, b_id""".stripMargin)),

    // DETERMINISTIC GLOBAL SHUFFLE + SHARDING — the last step of every
    // training-data pipeline: an engine- and layout-independent
    // pseudorandom permutation (md5 of the id, no RNG state) split into
    // equal-ish shards with a stable position inside each. NOT a global
    // sort: shard = leading hex nibble (mod n_shards) needs no
    // coordination, and the within-shard order is a per-shard local
    // sort after one shuffle on the shard key — at 100 TB each shard
    // sorts independently, and re-running on any cluster layout yields
    // byte-identical shard files.
    Q("pipeline_shuffle_shard",
      (s, d) => {
        val dig = md5(col("doc_id").cast("string"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("dig"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), dig.as("dig"))
          .withColumn("shard",
            (conv(substring(col("dig"), 1, 1), 16, 10).cast("int") % 4))
          .withColumn("pos", row_number().over(w))
          .select(col("shard"), col("pos"), col("doc_id"))
          .orderBy(col("shard"), col("pos"))
      },
      Some("""WITH a AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS dig
        |  FROM documents),
        | b AS (
        |  SELECT doc_id, dig,
        |    (strpos('0123456789abcdef', dig[1]) - 1) % 4 AS shard
        |  FROM a)
        |SELECT shard, row_number() OVER (PARTITION BY shard
        |         ORDER BY dig, doc_id) AS pos, doc_id
        |FROM b ORDER BY shard, pos""".stripMargin))
  )
}
