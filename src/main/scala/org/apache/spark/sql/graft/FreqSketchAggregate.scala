package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries frequent-items state: at most `capacity` (item → count)
  * counters plus the observed row total. The classic bounds:
  *
  *  - UPDATE: a new item with all counters full decrements every
  *    counter by 1 (dropping zeros) — each decrement "pays for" one
  *    increment, so est(x) ≥ true(x) − n/(capacity+1).
  *  - MERGE (Agarwal et al., Mergeable Summaries, PODS'12): sum
  *    counters pairwise; if over capacity, subtract the (capacity+1)-th
  *    largest count from all and drop ≤0. The combined summary keeps
  *    the SAME additive error bound over the concatenated stream, which
  *    is what makes the sketch safe for map-side partials + exchange.
  *
  * Consequence (the guarantee the engine's heavy-hitter path relies
  * on): any item with true frequency > n/(capacity+1) is PRESENT in the
  * final sketch, no matter how partitions were merged.
  */
final class FreqSketchBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[Long, Long]()
  var total: Long = 0L

  def add(item: Long): Unit = {
    total += 1
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) {
      counts.put(item, cur + 1)
    } else if (counts.size < capacity) {
      counts.put(item, 1L)
    } else {
      // decrement-all: amortized O(1) — every decrement cancels one
      // prior increment
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove()
        else e.setValue(e.getValue - 1)
      }
    }
  }

  def addCount(item: Long, c: Long): Unit = {
    val cur = counts.get(item)
    counts.put(item, cur + c)
  }

  def mergeFrom(other: FreqSketchBuffer): Unit = {
    total += other.total
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      addCount(e.getKey, e.getValue)
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val values = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val sub = values(values.length - capacity - 1)
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove()
        else e.setValue(e.getValue - sub)
      }
    }
  }

  /** (item, est) sorted est DESC, item ASC — deterministic surface for
    * a GIVEN merge tree (estimates themselves are partition-dependent;
    * consumers that need engine-portable output use the two-pass
    * heavy-hitter path, not raw estimates).
    */
  def sorted: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1
    }
    out.sortBy { case (item, est) => (-est, item) }
  }
}

/** Bounded frequent-items (Misra-Gries) aggregate:
  * `graft_freq_sketch(item, capacity)` →
  * `struct<total: bigint, items: array<struct<item, est>>>`.
  *
  * O(capacity) state per group regardless of cardinality — the scale
  * path for "what are the heavy keys" over a column with billions of
  * distincts, where an exact `GROUP BY` would shuffle every key. The
  * engine's two-pass heavy-hitter operator
  * ([[graft.ops.HeavyHitters]]) turns the candidate superset into an
  * exact, engine-portable answer.
  */
case class FreqSketch(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketchBuffer]
  with ExpectsInputTypes {

  require(capacity > 0, s"freq sketch needs capacity > 0, got $capacity")

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("item", LongType, nullable = false),
        StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "graft_freq_sketch"

  override def createAggregationBuffer(): FreqSketchBuffer =
    new FreqSketchBuffer(capacity)

  override def update(buf: FreqSketchBuffer, input: InternalRow)
      : FreqSketchBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: FreqSketchBuffer, other: FreqSketchBuffer)
      : FreqSketchBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: FreqSketchBuffer): Any = {
    val items = new GenericArrayData(buf.sorted.map { case (i, c) =>
      new GenericInternalRow(Array[Any](i, c))
    }.asInstanceOf[Array[Any]])
    new GenericInternalRow(Array[Any](buf.total, items))
  }

  override def serialize(buf: FreqSketchBuffer): Array[Byte] = {
    val pairs = buf.sorted
    val bb = ByteBuffer.allocate(12 + pairs.length * 16)
    bb.putLong(buf.total)
    bb.putInt(pairs.length)
    pairs.foreach { case (i, c) => bb.putLong(i); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqSketchBuffer(capacity)
    buf.total = bb.getLong
    val n = bb.getInt
    (0 until n).foreach(_ => buf.addCount(bb.getLong, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(item = newChildren(0))
}
