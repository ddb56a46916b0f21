package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: break text_normalize's sf1 cost into
  * scan+regex vs +sort vs double-regex-eval. Not part of the library.
  */
object DiagNormalize {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/localdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.sources.Tables.documents(spark, d)
    val cleaned = trim(regexp_replace(regexp_replace(
      lower(col("text")), "[^a-z0-9 .,!?']", " "), "\\s+", " "))
    def q(withSort: Boolean, twice: Boolean) = {
      val base = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        cleaned.as("clean_text"))
      val proj =
        if (twice) base.withColumn("n_chars_clean",
          length(col("clean_text")).cast("long"))
        else base.withColumn("n_chars_clean", lit(0L))
      if (withSort) proj.orderBy(col("doc_id")) else proj
    }
    // warmup
    q(withSort = true, twice = true).write.format("noop")
      .mode("overwrite").save()
    for (i <- 1 to 2) {
      time(s"full (sort+2nd length) #$i") {
        q(withSort = true, twice = true).write.format("noop")
          .mode("overwrite").save()
      }
      time(s"no sort #$i") {
        q(withSort = false, twice = true).write.format("noop")
          .mode("overwrite").save()
      }
      time(s"no 2nd length #$i") {
        q(withSort = true, twice = false).write.format("noop")
          .mode("overwrite").save()
      }
      time(s"regex only, no sort #$i") {
        q(withSort = false, twice = false).write.format("noop")
          .mode("overwrite").save()
      }
      time(s"scan only #$i") {
        docs.select(col("doc_id"), length(col("text")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    println("[diag] plan of full:")
    q(withSort = true, twice = true).explain("formatted")
    spark.stop()
  }
}
