package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column/API bridge for the engine's native Catalyst expressions.
  *
  * Lives under `org.apache.spark.sql` to reach the `private[sql]`
  * Column↔Expression converters (`classic.ExpressionUtils`) and the
  * session FunctionRegistry — the standard technique for libraries that
  * extend Spark with native expressions without forking it. Production
  * sessions can instead enable [[graft.functions.GraftExtensions]] via
  * `spark.sql.extensions` (the fully-public route); `install` exists so
  * the expressions also work on sessions the caller didn't build (the
  * driver-run Verify/Bench sessions here).
  */
object Native {

  private def c(e: Expression): Column = ExpressionUtils.column(e)
  private def e(col: Column): Expression = ExpressionUtils.expression(col)

  /** Codegen'd fold: Σ aᵢ·bᵢ in index order. */
  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  /** Codegen'd fused cosine: one pass for dot and both norms. */
  def cosine(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  /** Bounded top-k aggregate: k best (value, id) pairs per group with
    * map-side partial heaps — O(k) state, never a full partition sort.
    */
  def topk(value: Column, id: Column, k: Int): Column =
    c(TopKPairs(e(value), e(id), k).toAggregateExpression())

  /** Ranked payload-carrying top-k aggregate: k best (value, id) rows
    * per group with a payload struct riding through; mode 0|1|2 =
    * row_number|rank|dense_rank ≤ k retained-set semantics.
    */
  def topkRows(value: Column, id: Column, payload: Column, k: Int,
               mode: Int): Column =
    c(TopKRows(e(value), e(id), e(payload), k, mode)
      .toAggregateExpression())

  /** Codegen'd per-row 64-bit SimHash over a token array. */
  def simhash(tokens: Column): Column = c(SimHash(e(tokens)))

  /** Codegen'd per-row MinHash signature over a shingle-hash array. */
  def minhash(shingleHashes: Column, numHashes: Int): Column =
    c(MinHashSig(e(shingleHashes), numHashes))

  /** Codegen'd per-row distinct k-shingle hashing over a token array. */
  def shingles(tokens: Column, k: Int): Column =
    c(ShingleHashes(e(tokens), k))

  /** Element-wise vector-sum aggregate (O(dim) state, k-means update). */
  def vecsum(vec: Column): Column =
    c(VectorSum(e(vec)).toAggregateExpression())

  /** Count-min sketch aggregate: depth×width exact counters as a flat
    * `array<long>` (row-major), mergeable partials — O(depth·width)
    * state independent of key cardinality.
    */
  def countmin(key: Column, depth: Int, width: Int): Column =
    c(CountMinSketchAgg(e(key), depth, width).toAggregateExpression())

  /** Bloom-filter build aggregate over `xxhash64(key)` — binary
    * result, mergeable partials (Spark's own runtime-filter aggregate,
    * surfaced as an explicit API for application-level semi-join
    * reduction).
    */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    c(new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(e(key))),
          expectedItems)
      .toAggregateExpression())

  /** `might_contain(filter, xxhash64(key))` pruning predicate over a
    * pre-built filter's bytes.
    */
  def bloomMightContain(filterBytes: Array[Byte], key: Column): Column =
    c(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(
        filterBytes, org.apache.spark.sql.types.BinaryType),
      new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(e(key)))))

  /** Morton bit-interleave of two normalized coordinates (Z-order). */
  def morton(a: Column, b: Column, bits: Int): Column =
    c(MortonInterleave(e(a), e(b), bits))

  /** Bounded Misra-Gries frequent-items sketch (O(capacity) state). */
  def freqSketch(item: Column, capacity: Int): Column =
    c(FreqSketch(e(item), capacity).toAggregateExpression())

  /** Per-vector symmetric int8 quantization (8-bit embedding codes). */
  def quantizeI8(vec: Column): Column = c(QuantizeI8(e(vec)))

  /** Exact integer dot product over int8 codes. */
  def dotI8(a: Column, b: Column): Column = c(DotProductI8(e(a), e(b)))

  /** Per-row PQ encoding against trained codebooks (plan-bound, not an
    * expression subtree) — oracle-exact argmin per subspace.
    */
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    c(PqEncode(e(vec), books))

  /** Top-`np` IVF cell assignment against trained centroids
    * (plan-bound) — oracle-exact ascending (−cosine, cid) prefix.
    */
  def nearestCells(vec: Column, cents: Array[(Int, Array[Double])],
                   np: Int): Column =
    c(NearestCells(e(vec), cents, np))

  /** Min MD5-hex over 3-shingles of a token array (1-perm MinHash). */
  def minShingleMd5(tokens: Column): Column = c(MinShingleMd5(e(tokens)))

  /** md5-seeded MinHash signature (portable-hash twin of [[minhash]]). */
  def minhashMd5(tokens: Column, numHashes: Int, k: Int): Column =
    c(MinHashMd5(e(tokens), numHashes, k))

  /** md5 SimHash bit string (portable-hash twin of [[simhash]]). */
  def simhashMd5(tokens: Column): Column = c(SimHashMd5(e(tokens)))

  /** struct → binary Avro (registry-converter wire value). */
  def toAvro(value: Column): Column = c(AvroEncode(e(value)))

  /** binary Avro → struct under the given read schema. Permissive mode
    * (`failOnError = false`) nulls malformed records instead of failing
    * the task.
    */
  def fromAvro(value: Column,
               schema: org.apache.spark.sql.types.StructType,
               failOnError: Boolean = true): Column =
    c(AvroDecode(e(value), schema, failOnError))

  /** Register `graft_dot` / `graft_cosine` as SQL functions on an
    * existing session (idempotent).
    */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (args: Seq[Expression]) => TopKPairs(args.head, args(1),
        args(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression())
    reg.registerFunction(
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash(args.head))
    reg.registerFunction(
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue()))
    reg.registerFunction(
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles"),
      (args: Seq[Expression]) => ShingleHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue()))
    reg.registerFunction(
      FunctionIdentifier("graft_quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "graft_quantize_i8"),
      (args: Seq[Expression]) => QuantizeI8(args.head))
    reg.registerFunction(
      FunctionIdentifier("graft_dot_i8"),
      new ExpressionInfo(classOf[DotProductI8].getName, "graft_dot_i8"),
      (args: Seq[Expression]) => DotProductI8(args.head, args(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[MortonInterleave].getName, "graft_zorder"),
      (args: Seq[Expression]) => MortonInterleave(args.head, args(1),
        args(2).eval().asInstanceOf[Number].intValue()))
    reg.registerFunction(
      FunctionIdentifier("graft_freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "graft_freq_sketch"),
      (args: Seq[Expression]) => FreqSketch(args.head,
        args(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression())
    reg.registerFunction(
      FunctionIdentifier("graft_countmin"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName,
        "graft_countmin"),
      (args: Seq[Expression]) => CountMinSketchAgg(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression())
    // r10 (SqlEntrySpec matrix): the remaining DATA-ONLY kernels, so a
    // pure-SQL user reaches the same expression surface the DataFrame
    // API does. NOT registered — and documented here as the boundary:
    // NearestCells and PqEncode bind TRAINED ARTIFACTS (centroid /
    // codebook arrays) as plan objects; from SQL text those artifacts
    // have no sane literal form — the SQL route to the IVF/PQ families
    // is the persisted index (build once, probe via the read API), not
    // an inline expression.
    reg.registerFunction(
      FunctionIdentifier("graft_topk_rows"),
      new ExpressionInfo(classOf[TopKRows].getName, "graft_topk_rows"),
      (args: Seq[Expression]) => TopKRows(args.head, args(1), args(2),
        args(3).eval().asInstanceOf[Number].intValue(),
        args(4).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression())
    reg.registerFunction(
      FunctionIdentifier("graft_vecsum"),
      new ExpressionInfo(classOf[VectorSum].getName, "graft_vecsum"),
      (args: Seq[Expression]) => VectorSum(args.head)
        .toAggregateExpression())
    reg.registerFunction(
      FunctionIdentifier("graft_min_shingle_md5"),
      new ExpressionInfo(classOf[MinShingleMd5].getName,
        "graft_min_shingle_md5"),
      (args: Seq[Expression]) => MinShingleMd5(args.head))
    reg.registerFunction(
      FunctionIdentifier("graft_minhash_md5"),
      new ExpressionInfo(classOf[MinHashMd5].getName, "graft_minhash_md5"),
      (args: Seq[Expression]) => MinHashMd5(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()))
    reg.registerFunction(
      FunctionIdentifier("graft_simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "graft_simhash_md5"),
      (args: Seq[Expression]) => SimHashMd5(args.head))
  }
}
