package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: print the containment prefix plan to confirm the
  * WindowGroupLimit insertion. Not part of the library.
  */
object DiagPrefixPlan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, d)
    val out = graft.text.Dedup.containmentPairsPrefix(docs, 3, 0.9)
    val plan = out.queryExecution.executedPlan.toString
    println("HAS_WGL=" + plan.contains("WindowGroupLimit"))
    plan.linesIterator.filter(l => l.contains("WindowGroupLimit") ||
      l.contains("Window") || l.contains("Exchange hashpartitioning"))
      .take(12).foreach(println)
    spark.stop()
  }
}
