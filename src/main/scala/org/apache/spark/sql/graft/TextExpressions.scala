package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Per-row SimHash kernel shared by interpreted eval and codegen. */
object SimHashKernel {
  /** 64-bit SimHash of a token array: bit b is set iff
    * Σ_tokens (±1 by bit b of xxhash64(token, seed=42)) is positive —
    * bit-identical to the explode + 64-sign-sum aggregation formulation
    * (equivalence pinned in SimHashExpressionSpec), with ZERO shuffle:
    * each document's tokens already live in one row.
    */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Native SimHash: `array<string>` tokens → 64-bit digest in one
  * whole-stage-codegen pass. Replaces a 316k-row explode + 64-column
  * hash aggregate (one shuffle) with a per-row primitive loop — the
  * (b)-tier custom-Expression escalation SURVEY.md §4 reserves for
  * kernels the built-ins can't express efficiently.
  */
case class SimHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(v: Any): Any =
    SimHashKernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      a => s"org.apache.spark.sql.graft.SimHashKernel.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Per-row MinHash kernel shared by interpreted eval and codegen. */
object MinHashKernel {
  /** MinHash signature of a shingle-hash array under `numHashes`
    * simulated permutations. Permutation i of shingle h is
    * `XXH64.hashInt(i, XXH64.hashLong(h, 42))` — EXACTLY the hash chain
    * Spark's `xxhash64(h, i)` computes, so signatures are bit-identical
    * to the explode + numHashes-min-aggregate formulation
    * (MinHashExpressionSpec pins it).
    */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val base = XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native MinHash: `array<long>` shingle hashes → `array<long>`
  * signature in one codegen pass — replaces an explode +
  * numHashes-column min aggregate (one shuffle) with per-row work;
  * each document's shingles already live in one row.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0, s"minhash needs numHashes > 0, got $numHashes")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(v: Any): Any =
    MinHashKernel.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.MinHashKernel.compute($a, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

/** Per-row shingle-hash kernel shared by interpreted eval and codegen. */
object ShingleKernel {
  /** DISTINCT k-shingle hashes of a token array. Token t hashes as
    * Spark's `xxhash64(t)` (seed 42 over UTF8 bytes); the k-shingle at
    * position i hashes as `xxhash64(th[i], …, th[i+k-1])` — the same
    * seed-chained XXH64 the HOF formulation computes, so the multiset
    * of hashes is bit-identical (ShingleExpressionSpec pins it; output
    * order is sorted rather than first-occurrence, which no consumer
    * observes — every downstream op treats the result as a set).
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val m = n - k + 1
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var h = 42L
      var t = 0
      while (t < k) { h = XXH64.hashLong(th(j + t), h); t += 1 }
      out(j) = h
      j += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < m) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Native k-shingling: `array<string>` tokens → distinct `array<long>`
  * shingle hashes in one codegen pass. Replaces two interpreted
  * higher-order `transform` lambdas (per-element boxed xxhash64 calls —
  * the single hottest stage of the dedup family at sf0.1) with a
  * primitive loop.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"shingling needs k > 0, got $k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.ShingleKernel.compute($a, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashes = copy(child = newChild)
}

/** Per-row md5-seeded MinHash kernel (the PORTABLE-hash variant). */
object MinHashMd5Kernel {
  private val HexChars = "0123456789abcdef".toCharArray

  /** MinHash signature over string k-shingles with md5-seeded
    * permutations: sig[i] = min over shingles s of the hex digest
    * md5("<i>:" || s), where s = "t_p t_{p+1} … t_{p+k-1}". Exactly the
    * SQL `list_min(list_transform(shingles, s -> md5(i || ':' || s)))`
    * any engine with md5 can replay — hex min == unsigned digest min
    * because per-byte hex encoding is order-preserving. One
    * MessageDigest per row; the shingle bytes are fed incrementally
    * (concat_ws ' ' semantics: null tokens skipped, separator only
    * between non-nulls). Returns null for docs shorter than k tokens.
    */
  def compute(arr: ArrayData, numHashes: Int, k: Int): Any = {
    val n = arr.numElements()
    if (n < k) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(numHashes)(i =>
      (i.toString + ":").getBytes("UTF-8"))
    val mins = new Array[Array[Byte]](numHashes)
    var p = 0
    while (p <= n - k) {
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(prefixes(i))
        var written = false
        var j = 0
        while (j < k) {
          val t = arr.getUTF8String(p + j)
          if (t != null) {
            if (written) md.update(' '.toByte)
            md.update(t.getBytes)
            written = true
          }
          j += 1
        }
        val d = md.digest()
        if (mins(i) == null ||
            java.util.Arrays.compareUnsigned(d, mins(i)) < 0)
          mins(i) = d
        i += 1
      }
      p += 1
    }
    new GenericArrayData(mins.map { d =>
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexChars(d(b) & 0xf)
        b += 1
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex))
    })
  }
}

/** Native md5-seeded MinHash: `array<string>` tokens → `array<string>`
  * of numHashes min-md5-hex values — the portable-hash twin of
  * [[MinHashSig]] whose signatures ANY engine with md5 reproduces
  * (the xxhash64 kernel is the production path; this one exists so the
  * LSH dedup pipeline is externally hash-verifiable end to end).
  */
case class MinHashMd5(child: Expression, numHashes: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0, s"minhash needs numHashes > 0, got $numHashes")
  require(k > 0, s"shingling needs k > 0, got $k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_md5"

  override protected def nullSafeEval(v: Any): Any =
    MinHashMd5Kernel.compute(v.asInstanceOf[ArrayData], numHashes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val resTerm = ctx.freshName("minhashMd5")
    nullSafeCodeGen(ctx, ev, a => s"""
      |Object $resTerm = org.apache.spark.sql.graft.MinHashMd5Kernel.compute($a, $numHashes, $k);
      |if ($resTerm == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $resTerm;
      |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashMd5 = copy(child = newChild)
}

/** Per-row md5-based SimHash kernel (the PORTABLE-hash variant). */
object SimHashMd5Kernel {
  /** 64-bit SimHash over md5 token hashes, returned as a 64-char
    * '0'/'1' string (MSB of the digest first): position b is '1' iff
    * Σ_tokens (±1 by bit b of md5(token)) is positive, where bit b is
    * `get_bit(unhex(md5(t))::BIT, b)` — MSB-first over the digest
    * bytes, exactly the SQL formulation DuckDB evaluates. A string
    * (not a long) so no engine has to agree on 2⁶³ overflow semantics.
    */
  def compute(arr: ArrayData): Any = {
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        var b = 0
        while (b < 64) {
          val bit = (d(b >>> 3) >>> (7 - (b & 7))) & 1
          counts(b) += (if (bit == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Char](64)
    var b = 0
    while (b < 64) { out(b) = if (counts(b) > 0) '1' else '0'; b += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(out))
  }
}

/** Native md5 SimHash: `array<string>` tokens → 64-char bit string —
  * the portable-hash twin of [[SimHash]] (which is the xxhash64
  * production path), reproducible by any engine with md5 + get_bit.
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash_md5"

  override protected def nullSafeEval(v: Any): Any =
    SimHashMd5Kernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"(org.apache.spark.unsafe.types.UTF8String) " +
        s"org.apache.spark.sql.graft.SimHashMd5Kernel.compute($a)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashMd5 = copy(child = newChild)
}

object MinShingleKernel {
  /** Lexicographic-min MD5 hex digest over the k-shingle strings of a
    * token array — the 1-permutation MinHash fingerprint. Equals
    * `array_min(transform(shingles, s -> md5(s)))` exactly: MD5 runs
    * over the bytes of "t_i t_{i+1} … t_{i+k-1}" (fed incrementally —
    * the shingle string is never materialized), and min-hex-string ==
    * min-unsigned-digest-bytes because per-byte hex encoding is order
    * preserving. One MessageDigest instance per row, zero per-shingle
    * allocations beyond the 16-byte digest.
    */
  private val HexChars = "0123456789abcdef".toCharArray

  def compute(arr: ArrayData): Any = {
    val k = 3
    val n = arr.numElements()
    if (n < k) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var i = 0
    while (i <= n - k) {
      md.reset()
      // concat_ws semantics: null tokens are SKIPPED entirely — the
      // separator is only emitted between two non-null tokens (keeps
      // the kernel bitwise-equal to the HOF formulation on any input)
      var written = false
      var j = 0
      while (j < k) {
        val t = arr.getUTF8String(i + j)
        if (t != null) {
          if (written) md.update(' '.toByte)
          md.update(t.getBytes)
          written = true
        }
        j += 1
      }
      val d = md.digest()
      if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0)
        best = d
      i += 1
    }
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = HexChars((best(b) >> 4) & 0xf)
      hex(2 * b + 1) = HexChars(best(b) & 0xf)
      b += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex))
  }
}

/** Native min-shingle-MD5 fingerprint: `array<string>` tokens → the
  * smallest MD5 hex among all 3-shingles. Replaces two interpreted
  * higher-order `transform` lambdas (per-shingle string concat + boxed
  * md5 calls — 6.6 s of the sf0.1 bench) with one primitive loop.
  */
case class MinShingleMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_shingle_md5"

  override protected def nullSafeEval(v: Any): Any =
    MinShingleKernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val resTerm = ctx.freshName("minShingle")
    nullSafeCodeGen(ctx, ev, a => s"""
      |Object $resTerm = org.apache.spark.sql.graft.MinShingleKernel.compute($a);
      |if ($resTerm == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $resTerm;
      |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinShingleMd5 = copy(child = newChild)
}
