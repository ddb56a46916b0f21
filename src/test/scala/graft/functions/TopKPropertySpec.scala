package graft.functions

import org.apache.spark.sql.graft.{TopKBuffer, TopKPairs}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the graft_topk state machine: for ANY
  * input multiset (nulls included) and ANY split into partial buffers,
  * insert+merge+serialize round-trips equal the sort-based reference
  * answer under (value DESC NULLS LAST, id ASC) — the invariant that
  * makes map-side partial aggregation safe.
  */
class TopKPropertySpec extends AnyFunSuite {

  private type P = (Option[Double], Long)

  private def reference(xs: List[P], k: Int): List[P] =
    xs.sortBy { case (v, id) =>
      (if (v.isDefined) 0 else 1, -v.getOrElse(0.0), id)
    }.take(k)

  private val pairsGen: Gen[List[P]] = for {
    n <- Gen.choose(0, 80)
    xs <- Gen.listOfN(n, for {
      v <- Gen.frequency(
        5 -> Gen.choose(0, 20).map(d => Some(d.toDouble)), // many ties
        1 -> Gen.const(None))
      id <- Gen.choose(0L, 50L)
    } yield (v, id))
  } yield xs

  private def fill(buf: TopKBuffer, xs: List[P]): TopKBuffer = {
    xs.foreach {
      case (Some(v), id) => buf.insert(v, id)
      case (None, id) => buf.insertNull(id)
    }
    buf
  }

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("insert-only buffer equals sort-based top-k (nulls last)") {
    run(Prop.forAll(pairsGen, Gen.choose(1, 10)) { (xs, k) =>
      fill(new TopKBuffer(k), xs).sorted.toList == reference(xs, k)
    })
  }

  test("arbitrary split + merge equals single-buffer result") {
    run(Prop.forAll(pairsGen, Gen.choose(1, 6), Gen.choose(1, 5)) {
      (xs, k, nSplits) =>
        val whole = fill(new TopKBuffer(k), xs)
        val merged = xs.grouped(math.max(1, xs.size / nSplits + 1))
          .map(part => fill(new TopKBuffer(k), part))
          .foldLeft(new TopKBuffer(k)) { (acc, b) => acc.mergeFrom(b); acc }
        merged.sorted.toList == whole.sorted.toList
    })
  }

  test("serialize/deserialize round-trip preserves state") {
    val agg = TopKPairs(null, null, 4)
    run(Prop.forAll(pairsGen) { xs =>
      val buf = fill(new TopKBuffer(4), xs)
      agg.deserialize(agg.serialize(buf)).sorted.toList == buf.sorted.toList
    })
  }
}
