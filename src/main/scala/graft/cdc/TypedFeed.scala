package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed (`Dataset[T]`) facade over the change feed — the API shape a
  * Scala consumer of the library programs against when it wants the
  * compiler, not the analyzer, to catch column mistakes. Encoders are
  * derived from case classes; every transformation below compiles to
  * the SAME Catalyst plans as the untyped `DataFrame` path (asserted in
  * TypedFeedSpec), so type safety costs nothing at runtime: `as[T]` is
  * a schema assertion, not a conversion.
  *
  * Kept deliberately thin: the untyped API (`ChangeFeed`,
  * `Materialize`) remains the implementation; this layer only fixes
  * the row types at the boundary.
  */
object TypedFeed {

  /** One flattened change event (the shape `CdcQueries.flatFeed`
    * produces): `value`/`props` are None for delete images.
    */
  final case class FlatChange(
      key: String,
      event_id: Long,
      ts_us: Long,
      value: Option[Double],
      props: Option[String],
      op: String)

  /** One materialized current-state row (latest non-deleted image). */
  final case class CurrentRow(
      key: String,
      event_id: Long,
      ts_us: Long,
      value: Option[Double],
      props: Option[String])

  /** The flattened feed, typed. */
  def flatFeed(spark: SparkSession, dir: String): Dataset[FlatChange] = {
    import spark.implicits._
    graft.ops.CdcQueries.flatFeed(spark, dir).as[FlatChange]
  }

  /** Latest-wins current state, typed: same kernel as
    * [[Materialize.currentState]], output narrowed to [[CurrentRow]].
    */
  def currentState(feed: Dataset[FlatChange]): Dataset[CurrentRow] = {
    import feed.sparkSession.implicits._
    Materialize.currentState(feed.toDF(), Seq("key"),
        Seq(col("ts_us"), col("event_id")))
      .select("key", "event_id", "ts_us", "value", "props")
      .as[CurrentRow]
  }

  /** Typed filter example retained as API surface: ops of interest with
    * compile-checked field access (runs as a deserialized filter — use
    * column predicates on hot paths; the spec shows both compile to the
    * same rows).
    */
  def ofOps(feed: Dataset[FlatChange], ops: Set[String])
      : Dataset[FlatChange] =
    feed.filter(c => ops.contains(c.op))
}
