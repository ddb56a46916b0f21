package graft.functions

import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
import org.apache.spark.sql.graft.{TopKRowEntry, TopKRows, TopKRowsBuffer}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the graft_topk_rows state machine: for ANY
  * input multiset (nulls and duplicate ordering keys included) and ANY
  * split into partial buffers, the retained (row, rank) multiset equals
  * the window-filter reference (`{row_number|rank|dense_rank} ≤ k` under
  * v DESC NULLS LAST, id ASC) with payloads correctly associated.
  */
class TopKRowsPropertySpec extends AnyFunSuite {

  // (value, id, payload) — id nullable too (NULLS FIRST in the order)
  private type E = (Option[Double], Option[Long], Long)

  /** best-first total preorder; ties = equal (v, id). */
  private def sortKey(e: E): (Int, Double, Int, Long) =
    (if (e._1.isDefined) 0 else 1, -e._1.getOrElse(0.0),
      if (e._2.isDefined) 1 else 0, e._2.getOrElse(0L))

  /** window-filter reference: rank per mode over the full sorted list,
    * keep rank ≤ k. For rank/dense_rank the result is a deterministic
    * multiset even with duplicate (v, id) pairs.
    */
  private def reference(xs: List[E], k: Int, mode: Int)
      : List[(Option[Double], Option[Long], Long, Int)] = {
    val sorted = xs.sortBy(sortKey)
    var out = List.empty[(Option[Double], Option[Long], Long, Int)]
    var i = 0
    var group = 0
    while (i < sorted.length) {
      var j = i + 1
      while (j < sorted.length &&
        sortKey(sorted(j)) == sortKey(sorted(i))) j += 1
      (i until j).foreach { p =>
        val rk = mode match {
          case 0 => p + 1
          case 1 => i + 1
          case 2 => group + 1
        }
        if (rk <= k)
          out ::= (sorted(p)._1, sorted(p)._2, sorted(p)._3, rk)
      }
      group += 1
      i = j
    }
    out.reverse
  }

  private def fill(buf: TopKRowsBuffer, xs: List[E]): TopKRowsBuffer = {
    xs.foreach { case (v, id, pay) =>
      buf.insert(TopKRowEntry(v.isDefined, v.getOrElse(0.0),
        id.isDefined, id.getOrElse(0L),
        new GenericInternalRow(Array[Any](pay))))
    }
    buf
  }

  private def drain(buf: TopKRowsBuffer)
      : List[(Option[Double], Option[Long], Long, Int)] =
    buf.ranked.map { case (e, rk) =>
      (if (e.vDef) Some(e.v) else None,
        if (e.idDef) Some(e.id) else None, e.p.getLong(0), rk)
    }.toList

  private def canon(xs: List[(Option[Double], Option[Long], Long, Int)]) =
    xs.sortBy { case (v, id, pay, rk) =>
      (if (v.isDefined) 0 else 1, -v.getOrElse(0.0),
        if (id.isDefined) 1 else 0, id.getOrElse(0L), pay, rk)
    }

  // duplicate (v, id) pairs on purpose: ties across the k boundary
  private val entriesGen: Gen[List[E]] = for {
    n <- Gen.choose(0, 60)
    xs <- Gen.listOfN(n, for {
      v <- Gen.frequency(
        5 -> Gen.choose(0, 8).map(d => Some(d.toDouble)),
        1 -> Gen.const(None))
      id <- Gen.frequency(
        6 -> Gen.choose(0L, 6L).map(Some(_)),
        1 -> Gen.const(None))
      pay <- Gen.choose(0L, 1000L)
    } yield (v, id, pay))
  } yield xs

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("rank / dense_rank buffers equal the window-filter reference") {
    run(Prop.forAll(entriesGen, Gen.choose(1, 5), Gen.oneOf(1, 2)) {
      (xs, k, mode) =>
        canon(drain(fill(new TopKRowsBuffer(k, mode), xs))) ==
          canon(reference(xs, k, mode))
    })
  }

  test("row_number buffer equals reference when ordering keys unique") {
    val uniqueGen = entriesGen.map(_.zipWithIndex
      .map { case ((v, _, pay), i) => (v, Some(i.toLong): Option[Long], pay) })
    run(Prop.forAll(uniqueGen, Gen.choose(1, 5)) { (xs, k) =>
      canon(drain(fill(new TopKRowsBuffer(k, 0), xs))) ==
        canon(reference(xs, k, 0))
    })
  }

  test("arbitrary split + merge equals single-buffer result") {
    run(Prop.forAll(entriesGen, Gen.choose(1, 4), Gen.choose(1, 5),
      Gen.oneOf(1, 2)) { (xs, k, nSplits, mode) =>
      val whole = drain(fill(new TopKRowsBuffer(k, mode), xs))
      val merged = xs.grouped(math.max(1, xs.size / nSplits + 1))
        .map(part => fill(new TopKRowsBuffer(k, mode), part))
        .foldLeft(new TopKRowsBuffer(k, mode)) { (acc, b) =>
          acc.mergeFrom(b); acc
        }
      canon(drain(merged)) == canon(whole)
    })
  }

  test("serialize/deserialize round-trip preserves state") {
    val payloadType = StructType(Seq(StructField("pay", LongType)))
    val agg = TopKRows(null, null,
      Literal.create(null, payloadType), 3, 1)
    run(Prop.forAll(entriesGen) { xs =>
      val buf = fill(new TopKRowsBuffer(3, 1), xs)
      canon(drain(agg.deserialize(agg.serialize(buf)))) ==
        canon(drain(buf))
    })
  }
}
