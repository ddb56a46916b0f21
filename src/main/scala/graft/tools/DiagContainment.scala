package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: break dedup_containment's sf1 cost into
  * shingle build / df agg / candidate gen / size prune / verify.
  * Not part of the library.
  */
object DiagContainment {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/localdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, d)
    val k = 3; val threshold = 0.9
    val sh = graft.text.Dedup.hashedShingleSet(docs, k).cache()
    time("shingle build+cache") { sh.count() }
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val vol = time("sum(df^2) estimate") {
      dfreq.agg(sum(col("df") * col("df"))).head().getLong(0)
    }
    println(s"[diag] join volume = $vol")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = sh.join(dfreq, Seq("shingle"))
      .withColumn("pos", row_number().over(w))
      .join(sizes, Seq("doc_id"))
      .filter(col("pos") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 2)
      .select("doc_id", "shingle").cache()
    time("prefix set") { println(s"[diag] prefix rows = ${prefix.count()}") }
    val rawCands = prefix.as("a").join(sh.as("b"), Seq("shingle"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct().cache()
    time("candidate gen+distinct") {
      println(s"[diag] candidates = ${rawCands.count()}") }
    val pruned = rawCands
      .join(sizes.select(col("doc_id").as("a_id"),
        col("n_sh").as("n_a")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"),
        col("n_sh").as("n_b")), Seq("b_id"))
      .filter(col("n_b") >= ceil(lit(threshold) * col("n_a")) - lit(1))
      .select("a_id", "b_id").cache()
    time("size prune") { println(s"[diag] pruned = ${pruned.count()}") }
    time("verify joins+agg") {
      val n = pruned
        .join(sh.select(col("doc_id").as("a_id"), col("shingle")),
          Seq("a_id"))
        .join(sh.select(col("doc_id").as("b_id"), col("shingle")),
          Seq("b_id", "shingle"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("n_common"))
        .count()
      println(s"[diag] verified groups = $n")
    }
    spark.stop()
  }
}
