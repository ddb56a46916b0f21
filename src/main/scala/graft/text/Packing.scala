package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the training-prep step that bins documents into
  * fixed-capacity token windows (one bin = one training sequence):
  * greedy first-fit over a DETERMINISTIC document order (doc_id), so
  * the same corpus packs identically on any engine, any cluster
  * layout, any run — which is what makes the packing reproducible AND
  * DuckDB-verifiable (recursive-CTE oracle replays the same scan).
  *
  * Scale shape: packing is inherently a sequential scan WITHIN a bin
  * stream, so parallelism comes from the grouping key. `shards > 1`
  * splits each group into hash sub-streams packed independently —
  * group memory is bounded by corpus/(groups·shards), the knob a
  * 100 TB run turns up; each shard's pack stays deterministic. The
  * per-group scan itself is a `KeyValueGroupedDataset.flatMapGroups`
  * (typed Dataset API) — state is two longs, the sort is
  * O(group size) memory, the only shuffle is the groupByKey.
  */
object Packing {

  final case class DocLen(group: String, doc_id: Long, n_tok: Long)
  final case class Packed(group: String, doc_id: Long, n_tok: Long,
                          seq_id: Long)

  /** Greedy first-fit in doc_id order within each (groupCol, shard):
    * a doc that would overflow the open bin starts the next one (an
    * oversized doc therefore gets a bin of its own). Returns one row
    * per doc with its bin (`seq_id`, dense from 0 per group).
    */
  def packSequences(docs: DataFrame, capacity: Long,
                    groupCol: String = "lang",
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    shards: Int = 1): DataFrame = {
    require(capacity > 0 && shards > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val groupExpr =
      if (shards == 1) col(groupCol).cast("string")
      else concat_ws("#", col(groupCol).cast("string"),
        pmod(xxhash64(col(idCol)), lit(shards)))
    docs
      // dirty-corpus hygiene: a null id cannot be packed
      // deterministically (drop it); null text packs as an empty doc —
      // both would otherwise surface as an opaque executor-side
      // "null in non-nullable field" encoder crash
      .filter(col(idCol).isNotNull)
      .select(groupExpr.as("group"),
        col(idCol).cast("long").as("doc_id"),
        coalesce(size(TextAnalysis.tokens(col(textCol))), lit(0))
          .cast("long").as("n_tok"))
      .as[DocLen]
      .groupByKey(_.group)
      .flatMapGroups { (g, it) =>
        val sorted = it.toArray.sortBy(_.doc_id)
        var seq = 0L
        var fill = 0L
        var first = true
        sorted.iterator.map { d =>
          if (first) { fill = d.n_tok; first = false }
          else if (fill + d.n_tok > capacity) { seq += 1; fill = d.n_tok }
          else fill += d.n_tok
          Packed(g, d.doc_id, d.n_tok, seq)
        }
      }
      .toDF()
  }
}
