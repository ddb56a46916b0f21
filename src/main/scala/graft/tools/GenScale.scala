package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: produces an sfN directory by
  * replicating an existing sf dir `rep` times with key offsets —
  * the measured-scaling data point the 100 TB story needs (VERDICT r3
  * item 1: "every scale claim rests on plan shape alone; one real
  * scaling point validates or breaks the design").
  *
  * Design rules (so 10x data means 10x WORK, not a different problem):
  *  - fixed dimensions (`region`, `nation`) stay fixed — TPC-H semantics;
  *  - every other table gets `rep` key-shifted replicas: keys are dense
  *    0-based in the source, so replica i shifts by i * (max+1); all
  *    FK relationships hold within a replica by construction;
  *  - `events` keeps its timestamps: scale-up means DENSER streams and
  *    MORE keys (user_id shifts), not a longer history — the windowed /
  *    cutoff-split CDC queries see the same windows with 10x state;
  *  - `documents` text is perturbed per replica (every 3rd word, offset
  *    by replica, replaced with a replica-keyed token): within-replica
  *    duplicate structure is preserved exactly, cross-replica shingle
  *    Jaccard collapses (a 5-shingle survives two replicas only if all
  *    5 words survive both ≈ (4/9)^5 < 2%), so dup density per row is
  *    CONSTANT and dedup output scales linearly — replicating text
  *    verbatim would instead make every doc a 10-way duplicate and
  *    grow pair counts quadratically;
  *  - `embeddings` get a replica-keyed deterministic sign-flip mask
  *    (norms and within-replica cosines exactly preserved, cross-replica
  *    cosines decorrelate to ~0) — same argument for ANN/near-dup;
  *  - each replica is written as its own file in source row order, so
  *    sfN has rep files per table where sf0.1 has one — parquet
  *    row-group clustering and min/max stats scale faithfully instead
  *    of being shuffled away by a repartition.
  *
  * Usage: runMain graft.tools.GenScale <srcSfDir> <outDir> [rep=10]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("localdata/sf1")
    val rep = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) — Spark 4 rejects it
      // unless read as a raw nano-long (same conf Tables.events sets).
      // The replica is then WRITTEN as a plain INT64 nano column, which
      // Tables.eventsWindow reads identically (ts arrives as long either
      // way; filters and the µs conversion are value-compatible).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, rep)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      rep: Int): Unit = {
    def read(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")

    // replica i of a table: shift each key column by i * (its max + 1)
    def replicate(t: String, df: DataFrame, keyCols: Seq[String])
        (mutate: (DataFrame, Int) => DataFrame): Unit = {
      val offsets: Map[String, Long] = keyCols.map { k =>
        k -> (df.agg(max(col(k))).collect()(0).getLong(0) + 1L)
      }.toMap
      val dst = s"$out/$t.parquet"
      (0 until rep).foreach { i =>
        val shifted = offsets.foldLeft(df) { case (d, (k, off)) =>
          d.withColumn(k, col(k) + lit(i * off))
        }
        // one file per replica, source row order intact (see scaladoc)
        mutate(shifted, i).coalesce(1).write
          .mode(if (i == 0) "overwrite" else "append").parquet(dst)
      }
      println(s"[genscale] $t x$rep -> $dst")
    }
    def copy(t: String): Unit = {
      read(t).coalesce(1).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"[genscale] $t (fixed dim) -> $out/$t.parquet")
    }
    val keep = (d: DataFrame, _: Int) => d

    copy("region")
    copy("nation")
    replicate("customer", read("customer"), Seq("c_custkey"))(keep)
    replicate("supplier", read("supplier"), Seq("s_suppkey"))(keep)
    replicate("part", read("part"), Seq("p_partkey"))(keep)
    replicate("orders", read("orders"),
      Seq("o_orderkey", "o_custkey"))(keep)
    replicate("lineitem", read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))(keep)
    replicate("events", read("events"),
      Seq("event_id", "user_id"))(keep)

    replicate("documents", read("documents"), Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else {
        // every 3rd word (phase-shifted by replica) becomes a
        // replica-keyed token; hash() is Murmur3 — deterministic and
        // codegen'd. n_chars stays = length(text) (source invariant).
        val words = split(col("text"), " ")
        val mutated = array_join(
          transform(words, (w, idx) =>
            when(pmod(idx + lit(i), lit(3)) === 0,
              format_string("w%08x", hash(w, lit(i)))).otherwise(w)),
          " ")
        // cast to the source's int64 — length() is int, and a type
        // mismatch across part files in one directory fails the read
        d.withColumn("text", mutated)
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }

    replicate("embeddings", read("embeddings"), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, idx) =>
          when(pmod(hash(idx, lit(i)), lit(2)) === 0, x)
            .otherwise(-x)))
    }
  }
}
