package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: the k best (value, id) pairs seen so far, where
  * "better" = higher value, ties broken by smaller id, null values
  * ranked after every non-null — the EXACT total order of
  * `row_number() OVER (ORDER BY value DESC NULLS LAST, id)`. A min-heap
  * keyed worst-first gives O(log k) insert and O(1) "am I in the top k"
  * rejection; null-valued rows keep their own k-bounded id heap. State
  * is O(k) regardless of group size.
  */
final class TopKBuffer(val k: Int) {
  // worst-kept pair at the head: ascending value, descending id.
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(ord)
  // null-valued rows: keep the k SMALLEST ids (largest at the head).
  val nullHeap: mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty(Ordering.Long)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def insert(v: Double, id: Long): Unit = {
    val cand = (v, id)
    if (heap.size < k) heap.enqueue(cand)
    else if (better(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
  }

  def insertNull(id: Long): Unit =
    if (nullHeap.size < k) nullHeap.enqueue(id)
    else if (id < nullHeap.head) { nullHeap.dequeue(); nullHeap.enqueue(id) }

  def mergeFrom(other: TopKBuffer): Unit = {
    other.heap.foreach { case (v, id) => insert(v, id) }
    other.nullHeap.foreach(insertNull)
  }

  /** Best-first (value desc nulls last, id asc), exactly k or fewer:
    * non-null pairs first, then null-valued ids, truncated to k.
    */
  def sorted: Array[(Option[Double], Long)] = {
    val nonNull = heap.toArray.sortBy { case (v, id) => (-v, id) }
      .map { case (v, id) => (Some(v): Option[Double], id) }
    val nulls = nullHeap.toArray.sorted
      .map(id => (None: Option[Double], id))
    (nonNull ++ nulls).take(k)
  }
}

/** Per-group top-k as a [[TypedImperativeAggregate]] — the scale path
  * for "top k rows per group": partial heaps combine map-side, so at
  * most k·partitions pairs per group cross the exchange, versus the
  * window-function formulation (`row_number <= k`) which shuffles and
  * sorts EVERY row of every partition. Result: `array<struct<v,id>>`
  * best-first; `posexplode` restores rows (see `top_k_agg`, which the
  * driver hash-verifies against the window formulation's oracle).
  */
case class TopKPairs(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(value, id)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = true),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (i != null) {
      if (v != null) buf.insert(v.asInstanceOf[Double], i.asInstanceOf[Long])
      else buf.insertNull(i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v.orNull, id))
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val pairs = buf.sorted
    val bb = ByteBuffer.allocate(4 + pairs.length * 17)
    bb.putInt(pairs.length)
    pairs.foreach { case (v, id) =>
      bb.put((if (v.isDefined) 1 else 0): Byte)
      bb.putDouble(v.getOrElse(0.0)); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(k)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val defined = bb.get() == 1
      val v = bb.getDouble; val id = bb.getLong
      if (defined) buf.insert(v, id) else buf.insertNull(id)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(value = newChildren(0), id = newChildren(1))
}
