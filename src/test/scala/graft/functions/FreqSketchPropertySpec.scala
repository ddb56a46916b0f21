package graft.functions

import org.apache.spark.sql.graft.FreqSketchBuffer
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the Misra-Gries state machine: for ANY
  * input stream, ANY capacity, and ANY split into partial buffers
  * merged in ANY tree shape, the merged summary keeps the classic
  * bounds — est ≤ true, est ≥ true − n/(capacity+1), and every item
  * with true frequency > n/(capacity+1) survives. These are the
  * invariants that make the sketch safe for map-side partials and the
  * two-pass heavy-hitter EXACTNESS proof.
  */
class FreqSketchPropertySpec extends AnyFunSuite {

  // skewed item domain: small range + geometric repetition → real
  // heavy hitters exist under most draws
  private val streamGen: Gen[List[Long]] = for {
    n <- Gen.choose(0, 400)
    xs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(0L, 3L),     // hot items
      3 -> Gen.choose(4L, 20L),
      1 -> Gen.choose(21L, 200L))) // long tail
  } yield xs

  private val capGen: Gen[Int] = Gen.choose(1, 24)

  /** Random split into chunks + left-fold merge of per-chunk buffers
    * (chunk boundaries drawn by ScalaCheck ⇒ arbitrary partitionings;
    * serialize/deserialize exercised on every chunk).
    */
  private def sketchOf(xs: List[Long], splits: List[Int], cap: Int)
      : FreqSketchBuffer = {
    val chunks = splitBy(xs, splits)
    val agg = new org.apache.spark.sql.graft.FreqSketch(null, cap)
    val bufs = chunks.map { chunk =>
      val b = new FreqSketchBuffer(cap)
      chunk.foreach(b.add)
      agg.deserialize(agg.serialize(b)) // round-trip every partial
    }
    val out = new FreqSketchBuffer(cap)
    bufs.foreach(out.mergeFrom)
    out
  }

  private def splitBy(xs: List[Long], cuts: List[Int]): List[List[Long]] =
    if (xs.isEmpty) List(Nil)
    else {
      val sorted = cuts.map(c => math.abs(c) % (xs.length + 1))
        .distinct.sorted
      val bounds = (0 +: sorted :+ xs.length).distinct.sorted
      bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
    }

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("merged sketch keeps est ≤ true and est ≥ true − n/(cap+1)") {
    run(Prop.forAll(streamGen, Gen.listOf(Gen.choose(0, 400)), capGen) {
      (xs, cuts, cap) =>
        val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
        val slack = xs.length.toLong / (cap + 1)
        val sk = sketchOf(xs, cuts, cap)
        sk.total == xs.length &&
          sk.sorted.forall { case (item, est) =>
            val t = exact.getOrElse(item, 0L)
            est <= t && est >= t - slack
          }
    })
  }

  test("every item above n/(cap+1) survives any partitioned merge") {
    run(Prop.forAll(streamGen, Gen.listOf(Gen.choose(0, 400)), capGen) {
      (xs, cuts, cap) =>
        val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
        val bound = xs.length.toLong / (cap + 1)
        val kept = sketchOf(xs, cuts, cap).sorted.map(_._1).toSet
        exact.filter(_._2 > bound).keys.forall(kept.contains)
    })
  }

  test("sketch size never exceeds capacity") {
    run(Prop.forAll(streamGen, Gen.listOf(Gen.choose(0, 400)), capGen) {
      (xs, cuts, cap) => sketchOf(xs, cuts, cap).counts.size <= cap
    })
  }
}
