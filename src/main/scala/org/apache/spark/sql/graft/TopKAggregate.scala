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

/** Ranked, payload-carrying top-k state. Entries are (v, id, payload)
  * rows (both v and id may be null); the retained set is exactly the
  * rows the corresponding window filter would keep under
  * ORDER BY (v DESC NULLS LAST, id ASC NULLS FIRST):
  *
  *  - mode 0 (row_number ≤ k): the k best rows;
  *  - mode 1 (rank ≤ k): rows with < k strictly-better rows — boundary
  *    ties ALL qualify, so the set can exceed k exactly when the window
  *    emits more than k rows;
  *  - mode 2 (dense_rank ≤ k): rows in the first k distinct (v, id)
  *    tie-groups.
  *
  * Retained size is k plus tie overhang (bounded by duplicate
  * multiplicity of the ordering key, not by group size). Inserts append
  * and trim lazily at 4k so per-row cost stays O(1) amortized.
  */
final class TopKRowsBuffer(val k: Int, val mode: Int) {
  import scala.collection.mutable.ArrayBuffer

  var entries: ArrayBuffer[TopKRowEntry] = ArrayBuffer.empty
  // adaptive lazy-trim threshold: if the QUALIFYING set itself exceeds
  // the base threshold (massive rank ties), doubling keeps insert cost
  // O(log n) amortized instead of re-sorting the whole buffer per row
  private var trimAt: Int = 0

  /** best-first: v DESC NULLS LAST, id ASC NULLS FIRST (a null id
    * out-ranks non-null ids within a value tie — the window's order).
    */
  private def cmp(a: TopKRowEntry, b: TopKRowEntry): Int =
    if (a.vDef && b.vDef) {
      val c = java.lang.Double.compare(b.v, a.v)
      if (c != 0) c else cmpId(a, b)
    } else if (a.vDef) -1
    else if (b.vDef) 1
    else cmpId(a, b)

  private def cmpId(a: TopKRowEntry, b: TopKRowEntry): Int =
    if (a.idDef && b.idDef) java.lang.Long.compare(a.id, b.id)
    else if (a.idDef) 1       // non-null id AFTER null id (NULLS FIRST)
    else if (b.idDef) -1
    else 0

  private def samePair(a: TopKRowEntry, b: TopKRowEntry): Boolean =
    cmp(a, b) == 0

  def insert(e: TopKRowEntry): Unit = {
    if (trimAt == 0) trimAt = math.max(4 * k, 64)
    entries += e
    if (entries.length >= trimAt) {
      trim()
      trimAt = math.max(math.max(4 * k, 64), entries.length * 2)
    }
  }

  def mergeFrom(other: TopKRowsBuffer): Unit = {
    entries ++= other.entries
    trim()
  }

  /** Reduce to exactly the qualifying set (sorted best-first). */
  def trim(): Unit = {
    val s = entries.sortWith((a, b) => cmp(a, b) < 0)
    if (s.length <= k) { entries = s; return }
    val kept = ArrayBuffer.empty[TopKRowEntry]
    mode match {
      case 0 =>
        kept ++= s.take(k)
      case 1 => // rank: keep whole tie-groups while groupStart < k
        var i = 0
        while (i < s.length && i < k) {
          var j = i + 1
          while (j < s.length && samePair(s(j), s(i))) j += 1
          kept ++= s.slice(i, j)
          i = j
        }
      case 2 => // dense_rank: keep the first k distinct tie-groups
        var i = 0
        var groups = 0
        while (i < s.length && groups < k) {
          var j = i + 1
          while (j < s.length && samePair(s(j), s(i))) j += 1
          kept ++= s.slice(i, j)
          groups += 1
          i = j
        }
    }
    entries = kept
  }

  /** (entry, rank) best-first with mode-correct rank values. */
  def ranked: Seq[(TopKRowEntry, Int)] = {
    trim()
    val out = ArrayBuffer.empty[(TopKRowEntry, Int)]
    var i = 0
    var groupIdx = 0
    while (i < entries.length) {
      var j = i + 1
      while (j < entries.length && samePair(entries(j), entries(i))) j += 1
      var p = i
      while (p < j) {
        val rk = mode match {
          case 0 => p + 1
          case 1 => i + 1
          case 2 => groupIdx + 1
        }
        out += ((entries(p), rk))
        p += 1
      }
      groupIdx += 1
      i = j
    }
    out.toSeq
  }
}

/** One retained row: nullable value and nullable id flags are explicit
  * so the aggregate reproduces the window's NULLS LAST / NULLS FIRST
  * order for real (nullable) table columns.
  */
final case class TopKRowEntry(vDef: Boolean, v: Double, idDef: Boolean,
                              id: Long, p: InternalRow)

/** Ranked top-k rows per group as a [[TypedImperativeAggregate]]: the
  * generalization of [[TopKPairs]] that (a) reproduces rank /
  * dense_rank ≤ k tie semantics exactly and (b) carries an arbitrary
  * payload struct through the aggregation, so `SELECT *`-under-rank
  * rewrites stay lossless. Partial buffers combine map-side; ≤
  * (k + tie-overhang)·partitions rows per group cross the exchange.
  * Result: `array<struct<v, id, rk, p>>` best-first.
  */
case class TopKRows(
    value: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k > 0, s"top-k needs k > 0, got $k")
  require(mode >= 0 && mode <= 2, s"mode must be 0|1|2, got $mode")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (value.dataType != DoubleType)
      TypeCheckFailure(s"value must be double, got ${value.dataType}")
    else if (id.dataType != LongType)
      TypeCheckFailure(s"id must be bigint, got ${id.dataType}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckFailure(s"payload must be a struct, got ${payload.dataType}")
    else TypeCheckSuccess
  }

  private def payloadSchema: StructType =
    payload.dataType.asInstanceOf[StructType]

  /** Payload fields forced nullable: a NULL payload struct is stored as
    * an all-null row, which must be legal for the serde projection and
    * the declared output type even when the source fields are
    * non-nullable (widening only — never narrows real values).
    */
  private def payloadSchemaNullable: StructType =
    StructType(payloadSchema.map(_.copy(nullable = true)))

  @transient private lazy val payloadProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(payloadSchemaNullable)

  override def children: Seq[Expression] = Seq(value, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true),
      StructField("rk", IntegerType, nullable = false),
      StructField("p", payloadSchemaNullable, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk_rows"

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(k, mode)

  override def update(buf: TopKRowsBuffer, input: InternalRow)
      : TopKRowsBuffer = {
    val v = value.eval(input)
    val i = id.eval(input)
    val p = payload.eval(input).asInstanceOf[InternalRow]
    // a NULL payload struct becomes an all-null row of the payload arity
    // (InternalRow.empty would crash serialize's UnsafeProjection)
    val pCopy =
      if (p == null) new GenericInternalRow(payloadSchema.length)
      else p.copy()
    buf.insert(TopKRowEntry(
      v != null, if (v != null) v.asInstanceOf[Double] else 0.0,
      i != null, if (i != null) i.asInstanceOf[Long] else 0L,
      pCopy))
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer)
      : TopKRowsBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKRowsBuffer): Any =
    new GenericArrayData(buf.ranked.map { case (e, rk) =>
      new GenericInternalRow(Array[Any](
        if (e.vDef) e.v else null,
        if (e.idDef) e.id else null,
        rk, e.p))
    }.toArray.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    buf.trim()
    // payloadProj REUSES its result row — and for fixed-width schemas
    // getBytes returns the shared backing array itself, so every entry
    // would alias the last projected payload. copy() first.
    val rows = buf.entries.map(e => (e, payloadProj(e.p).copy().getBytes))
    val size = 4 + rows.map(18 + 4 + _._2.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(rows.length)
    rows.foreach { case (e, pb) =>
      bb.put((if (e.vDef) 1 else 0): Byte)
      bb.put((if (e.idDef) 1 else 0): Byte)
      bb.putDouble(e.v); bb.putLong(e.id)
      bb.putInt(pb.length); bb.put(pb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKRowsBuffer(k, mode)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val vDef = bb.get() == 1
      val idDef = bb.get() == 1
      val v = bb.getDouble; val id = bb.getLong
      val plen = bb.getInt
      val pb = new Array[Byte](plen); bb.get(pb)
      val row = new org.apache.spark.sql.catalyst.expressions
        .UnsafeRow(payloadSchemaNullable.length)
      row.pointTo(pb, plen)
      buf.insert(TopKRowEntry(vDef, v, idDef, id, row))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(value = newChildren(0), id = newChildren(1),
      payload = newChildren(2))
}
