package graft.cdc

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck property (SURVEY.md §5.2 item 3): for ANY sequence of
  * change events, the distributed latest-wins materialization (A1+A2)
  * equals a sequential replay of the log into a key-value map.
  */
/** Top-level so Spark's encoder codegen sees a static case class. */
case class ReplayEv(key: Int, seq: Int, op: String, value: Int)

class ReplayPropertySpec extends SparkSpec {

  private type Ev = ReplayEv
  private def Ev(key: Int, seq: Int, op: String, value: Int): ReplayEv =
    ReplayEv(key, seq, op, value)

  private val opGen = Gen.frequency(3 -> "c", 4 -> "u", 2 -> "d", 1 -> "r")

  private val logGen: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 60)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 7)
      op <- opGen
      v <- Gen.choose(0, 999)
    } yield (k, op, v))
  } yield evs.zipWithIndex.map { case ((k, op, v), i) => Ev(k, i, op, v) }

  private def sequentialReplay(log: List[Ev]): Map[Int, Int] =
    log.sortBy(_.seq).foldLeft(Map.empty[Int, Int]) { (state, e) =>
      e.op match {
        case "d" => state - e.key
        case _   => state + (e.key -> e.value)
      }
    }

  test("property: distributed materialization == sequential replay") {
    import spark.implicits._
    val prop = Prop.forAll(logGen) { log =>
      val expected = sequentialReplay(log)
      val actual =
        if (log.isEmpty) Map.empty[Int, Int]
        else {
          val df = log.toDF()
          Materialize.currentState(df, Seq("key"), Seq(col("seq")))
            .select("key", "value")
            .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        }
      actual == expected
    }
    // fewer iterations than a pure-JVM property: each case runs a job
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
