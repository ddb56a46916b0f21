package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) over
  * a LONG key column: `depth` rows of `width` counters, row i keyed by
  * the classic `((x mod p)·aᵢ + bᵢ) mod p mod width` hash with
  * p = 2³¹−1 (Mersenne prime). Point estimate = min over rows of the
  * addressed counter — never an underestimate, and over by more than
  * ε·N with probability ≤ (1/2^depth) for width = ⌈e/ε⌉.
  *
  * Complements the engine's Misra-Gries sketch ([[FreqSketch]]): MG
  * answers "which keys are heavy" in O(capacity) state but cannot
  * answer a point query for an arbitrary key; CMS answers point
  * queries for ANY key in O(depth·width) state independent of the
  * number of distincts. Both are exactly mergeable (counter-wise sum
  * here), which is what makes map-side partials + a single exchange
  * row the whole distributed story — at 100 TB the sketch crossing
  * the wire is depth·width longs regardless of key cardinality.
  *
  * DETERMINISM CONTRACT (SURVEY.md §7.2): every counter is an exact
  * count of the rows hashing there — update is +1, merge is +, no
  * randomness at query time (the hash constants are fixed). The
  * DuckDB oracle therefore reproduces the sketch bit-for-bit with a
  * GROUP BY over the same hash arithmetic, making the CMS estimate
  * itself hash-verifiable, not just "within bound".
  *
  * Anchor: a north-star extension (BASELINE.json `north_star`), not a
  * reference script. The toolkit's monitoring surface is MSK's
  * PER_TOPIC_PER_PARTITION metric level
  * (/root/reference/bin/msk-cluster.sh:71) — per-topic event counting
  * over a bounded topic set; a data-plane engine counting per-KEY
  * frequencies over an unbounded domain needs the sketch + exact
  * top-k refinement pattern used by `agg_countmin` instead.
  */
object CountMin {
  val Prime: Long = 2147483647L // 2^31 - 1
  // fixed pairwise-independent family: (a·x + b) mod p, a ∈ [1, p)
  val A: Array[Long] = Array(131071L, 524287L, 8191L, 6700417L)
  val B: Array[Long] = Array(12345L, 67890L, 424242L, 987654L)

  /** Row-i cell for key x (x may be any long; mod is made non-negative
    * the same way both engines' `%` behaves for non-negative x — the
    * aggregate requires keys ≥ 0, asserted at update).
    */
  def cell(x: Long, i: Int, width: Int): Int =
    ((((x % Prime) * A(i) + B(i)) % Prime) % width).toInt
}

case class CountMinSketchAgg(
    key: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes {

  require(depth > 0 && depth <= CountMin.A.length,
    s"depth must be in [1, ${CountMin.A.length}], got $depth")
  require(width > 0, s"width must be > 0, got $width")

  override def children: Seq[Expression] = Seq(key)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_countmin"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = key.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x >= 0, s"graft_countmin requires non-negative keys, got $x")
      var i = 0
      while (i < depth) {
        buf(i * width + CountMin.cell(x, i, width)) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(key = newChildren(0))
}
