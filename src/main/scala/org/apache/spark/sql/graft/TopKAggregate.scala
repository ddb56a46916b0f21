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
  * "better" = higher value, ties broken by smaller id (the same total
  * order as `row_number() OVER (ORDER BY value DESC, id)`). A min-heap
  * keyed worst-first gives O(log k) insert and O(1) "am I in the top k"
  * rejection, so state is O(k) regardless of group size.
  */
final class TopKBuffer(val k: Int) {
  // worst-kept pair at the head: ascending value, descending id.
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(ord)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def insert(v: Double, id: Long): Unit = {
    val cand = (v, id)
    if (heap.size < k) heap.enqueue(cand)
    else if (better(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (v, id) => insert(v, id) }

  /** Best-first (value desc, id asc). */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (v, id) => (-v, id) }
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
      StructField("v", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      buf.insert(v.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val pairs = buf.sorted
    val bb = ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    pairs.foreach { case (v, id) => bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(k)
    val n = bb.getInt
    (0 until n).foreach(_ => buf.insert(bb.getDouble, bb.getLong))
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
