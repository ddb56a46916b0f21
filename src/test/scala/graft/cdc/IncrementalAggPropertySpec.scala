package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck property behind `pipeline_incremental_agg`: for ANY event
  * log and ANY cutoff, aggregating the pre-cutoff state and the
  * post-cutoff delta separately and merging by partial-merge algebra
  * (counts add, decimal sums add) equals aggregating the full history —
  * i.e. maintaining a materialized rollup never requires a rescan.
  */
case class IncEv(key: Int, ts: Long, value: Double)

class IncrementalAggPropertySpec extends SparkSpec {

  private val logGen: Gen[(List[IncEv], Long)] = for {
    n <- Gen.choose(0, 80)
    evs <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 5)
      t <- Gen.choose(0L, 999L)
      v <- Gen.choose(-99999, 99999)
    } yield IncEv(k, t, v / 100.0))
    cutoff <- Gen.choose(0L, 1000L)
  } yield (evs, cutoff)

  private def part(df: DataFrame): DataFrame = df
    .groupBy(col("key"))
    .agg(count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).as("sv"))

  private def rows(df: DataFrame): Set[(Int, Long, BigDecimal)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1),
      BigDecimal(r.getDecimal(2)))).toSet

  test("property: merged partials == full-history aggregate") {
    import spark.implicits._
    val prop = Prop.forAll(logGen) { case (log, cutoff) =>
      val df = log.toDF()
      val merged = part(df.filter(col("ts") < cutoff))
        .unionByName(part(df.filter(col("ts") >= cutoff)))
        .groupBy(col("key"))
        .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      // re-summing widens the decimal scale; normalize for comparison
      val full = part(df)
        .select(col("key"), col("n"),
          col("sv").cast("decimal(28,2)").as("sv"))
      val m = merged.select(col("key"), col("n"),
        col("sv").cast("decimal(28,2)").as("sv"))
      rows(m) == rows(full)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
