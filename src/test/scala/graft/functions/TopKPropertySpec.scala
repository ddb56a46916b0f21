package graft.functions

import org.apache.spark.sql.graft.{TopKBuffer, TopKPairs}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the graft_topk state machine: for ANY
  * input multiset and ANY split into partial buffers, insert+merge+
  * serialize round-trips equal the sort-based reference answer —
  * the invariant that makes map-side partial aggregation safe.
  */
class TopKPropertySpec extends AnyFunSuite {

  private def reference(xs: List[(Double, Long)], k: Int) =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)

  private val pairsGen: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(0, 80)
    xs <- Gen.listOfN(n, for {
      v <- Gen.choose(0, 20).map(_.toDouble) // narrow range ⇒ many ties
      id <- Gen.choose(0L, 50L)
    } yield (v, id))
  } yield xs

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("insert-only buffer equals sort-based top-k") {
    run(Prop.forAll(pairsGen, Gen.choose(1, 10)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (v, id) => buf.insert(v, id) }
      buf.sorted.toList == reference(xs, k)
    })
  }

  test("arbitrary split + merge equals single-buffer result") {
    run(Prop.forAll(pairsGen, Gen.choose(1, 6), Gen.choose(1, 5)) {
      (xs, k, nSplits) =>
        val whole = new TopKBuffer(k)
        xs.foreach { case (v, id) => whole.insert(v, id) }
        val merged = xs.grouped(math.max(1, xs.size / nSplits + 1))
          .map { part =>
            val b = new TopKBuffer(k)
            part.foreach { case (v, id) => b.insert(v, id) }
            b
          }
          .foldLeft(new TopKBuffer(k)) { (acc, b) => acc.mergeFrom(b); acc }
        merged.sorted.toList == whole.sorted.toList
    })
  }

  test("serialize/deserialize round-trip preserves state") {
    val agg = TopKPairs(null, null, 4)
    run(Prop.forAll(pairsGen) { xs =>
      val buf = new TopKBuffer(4)
      xs.foreach { case (v, id) => buf.insert(v, id) }
      agg.deserialize(agg.serialize(buf)).sorted.toList == buf.sorted.toList
    })
  }
}
