package graft.cdc

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties for the SCD type-2 builder: for ANY change
  * log, (1) a point-in-time read of the version intervals equals the
  * latest-wins replay truncated at that instant, for every instant;
  * (2) per key the intervals are disjoint, ordered, and at most one is
  * open; (3) an open interval exists iff the key's last change is not
  * a delete.
  */
case class Scd2Ev(key: Int, seq: Long, op: String, value: Int)

class Scd2PropertySpec extends SparkSpec {

  private val opGen = Gen.frequency(3 -> "c", 4 -> "u", 2 -> "d")

  private val logGen: Gen[List[Scd2Ev]] = for {
    n <- Gen.choose(1, 50)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 5)
      op <- opGen
      v <- Gen.choose(0, 999)
    } yield (k, op, v))
  } yield evs.zipWithIndex.map { case ((k, op, v), i) =>
    Scd2Ev(k, i.toLong, op, v)
  }

  private def replayAt(log: List[Scd2Ev], t: Long): Map[Int, Int] =
    log.filter(_.seq <= t).sortBy(_.seq)
      .foldLeft(Map.empty[Int, Int]) { (state, e) =>
        e.op match {
          case "d" => state - e.key
          case _   => state + (e.key -> e.value)
        }
      }

  test("property: SCD2 as-of == truncated replay at every instant") {
    import spark.implicits._
    val prop = Prop.forAll(logGen) { log =>
      val dim = Materialize.scd2(log.toDF(), Seq("key"), Seq(col("seq")))
        .select("key", "value", "valid_from_us", "valid_to_us")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      // every event time plus the far future — the instants where the
      // active version set can change
      log.map(_.seq).distinct.forall { t =>
        val expected = replayAt(log, t)
        val active = dim
          .filter { case (_, _, from, to) => from <= t && t < to }
          .map { case (k, v, _, _) => k -> v }.toMap
        active == expected
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: intervals disjoint and ordered; open iff not deleted") {
    import spark.implicits._
    val prop = Prop.forAll(logGen) { log =>
      val rows = Materialize.scd2(log.toDF(), Seq("key"), Seq(col("seq")))
        .select("key", "valid_from_us", "valid_to_us", "is_current")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(3)))
      val lastOp = log.groupBy(_.key).map { case (k, evs) =>
        k -> evs.maxBy(_.seq).op
      }
      rows.groupBy(_._1).forall { case (k, vs) =>
        val sorted = vs.sortBy(_._2)
        val disjoint = sorted.sliding(2).forall {
          case Array((_, _, Some(to), _), (_, from, _, _)) => to <= from
          case Array((_, _, None, _), _) => false // open must be last
          case _ => true
        }
        val opens = vs.count(_._3.isEmpty)
        val openExpected = if (lastOp(k) == "d") 0 else 1
        // is_current marks exactly the open interval
        disjoint && opens == openExpected &&
          vs.forall(v => v._4 == v._3.isEmpty)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }
}
