package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CountMin, CountMinSketchAgg, Native}

import graft.SparkSpec

/** Count-min sketch aggregate: the CMS guarantees (never under, over
  * only by colliding mass), exact mergeability across partition
  * layouts, and serialization round-trip.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 256

  /** Reference CMS built serially on the driver. */
  private def refSketch(keys: Seq[Long]): Array[Long] = {
    val buf = new Array[Long](depth * width)
    keys.foreach { x =>
      (0 until depth).foreach { i =>
        buf(i * width + CountMin.cell(x, i, width)) += 1
      }
    }
    buf
  }

  private def refEstimate(sketch: Array[Long], x: Long): Long =
    (0 until depth).map(i => sketch(i * width + CountMin.cell(x, i, width))).min

  private val keys: Seq[Long] =
    (1L to 2000L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i * 31 % 401))

  test("distributed sketch equals the serial reference, any partitioning") {
    val ref = refSketch(keys)
    Seq(1, 3, 8).foreach { parts =>
      val got = keys.toDF("k").repartition(parts)
        .agg(Native.countmin(col("k"), depth, width))
        .head().getSeq[Long](0).toArray
      assert(got.sameElements(ref), s"parts=$parts")
    }
  }

  test("estimate never underestimates; equals exact when no collision") {
    val sketch = refSketch(keys)
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (k, cnt) =>
      val est = refEstimate(sketch, k)
      assert(est >= cnt, s"key $k: est $est < exact $cnt")
    }
    // total over-mass per row equals total stream mass (each row of the
    // sketch partitions the stream), so SOME keys must be exact when
    // distincts < width and collisions are sparse in at least one row
    val exactHits = exact.count { case (k, cnt) => refEstimate(sketch, k) == cnt }
    assert(exactHits > 0, "no key estimated exactly — hash family degenerate?")
  }

  test("serialization round-trips the buffer") {
    val agg = CountMinSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), depth, width)
    val buf = refSketch(keys)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sameElements(buf))
  }

  test("negative keys are rejected loudly (contract with the oracle's %)") {
    val ex = intercept[Exception] {
      Seq(-5L).toDF("k").agg(Native.countmin(col("k"), depth, width)).head()
    }
    assert(ex.getMessage != null)
  }

  test("nulls are skipped, not counted") {
    val got = Seq(Some(7L), None, Some(7L)).toDF("k")
      .agg(Native.countmin(col("k"), depth, width))
      .head().getSeq[Long](0).toArray
    assert(got.sum === depth * 2L) // two rows counted in each of 4 sketch rows
  }

  test("aggregate plans with map-side partials (ObjectHashAggregate)") {
    val plan = keys.toDF("k").repartition(4)
      .agg(Native.countmin(col("k"), depth, width))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_countmin"),
      "map-side partial missing — every row would cross the exchange")
  }
}
