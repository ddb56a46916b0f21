package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query plus its DuckDB oracle (SURVEY.md §5.2).
  *
  * `oracle` is ANSI-ish SQL DuckDB runs over the same parquet tables
  * (registered by bare table name). `None` ⇒ the op isn't SQL-expressible
  * (sketches, stubs) and the driver records a weaker rows-only check.
  *
  * Determinism contract for hash-matching (SURVEY.md §7.2): every query
  * ends in a total-order `ORDER BY`; aggregates over doubles go through
  * exact decimal arithmetic before a final cast to double; timestamps are
  * surfaced as epoch-microsecond longs; column names are aliased
  * identically on both sides.
  *
  * `round(x, n)` caveat: Spark (BigDecimal half-up over the shortest
  * decimal representation) and DuckDB (`std::round(x·10ⁿ)/10ⁿ`) agree on
  * every double EXCEPT exact decimal ties — reachable when x is a ratio
  * of small integers (confirmed divergent at 1 − 307/640 with n=6), all
  * but unreachable for log/sqrt/cosine-family values. Rule: never round
  * an integer-ratio column (ship the raw division — it is bit-identical
  * across engines); rounding irrational-family values for display/rank
  * stability is fine.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[Q]
}
