package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.CdcQueries
import graft.sources.Tables

/** Typed Dataset facade: same rows, same plans as the untyped path —
  * `as[T]` must be a free schema assertion, not a different pipeline.
  */
class TypedFeedSpec extends SparkSpec {

  test("typed flat feed equals the untyped flat feed row-for-row") {
    val typed = TypedFeed.flatFeed(spark, sf)
    val untyped = CdcQueries.flatFeed(spark, sf)
    assert(typed.count() === untyped.count())
    assert(typed.toDF().except(untyped).isEmpty)
  }

  test("typed currentState equals Materialize.currentState") {
    val feed = TypedFeed.flatFeed(spark, sf)
    val typed = TypedFeed.currentState(feed)
    val untyped = Materialize.currentState(
      CdcQueries.flatFeed(spark, sf), Seq("key"),
      Seq(col("ts_us"), col("event_id")))
      .select("key", "event_id", "ts_us", "value", "props")
    assert(typed.toDF().except(untyped).isEmpty)
    assert(typed.count() === untyped.count())
    // typed rows are real case classes
    val row = typed.orderBy("key").head()
    assert(row.key.nonEmpty && row.ts_us > 0L)
  }

  test("typed lambda filter selects the same rows as a column predicate") {
    val feed = TypedFeed.flatFeed(spark, sf)
    val viaLambda = TypedFeed.ofOps(feed, Set("c", "d")).toDF()
    val viaColumn = feed.toDF().filter(col("op").isin("c", "d"))
    assert(viaLambda.except(viaColumn).isEmpty)
    assert(viaLambda.count() === viaColumn.count())
  }

  test("events table round-trips through the typed boundary losslessly") {
    // the ns-timestamp gotcha must not leak through the typed layer
    val n = Tables.events(spark, sf).count()
    assert(TypedFeed.flatFeed(spark, sf).count() === n)
  }
}
