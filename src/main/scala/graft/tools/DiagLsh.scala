package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: LSH time and candidate volume vs planes per
  * band at a given SF — the occupancy knob measurement. Not part of
  * the library.
  */
object DiagLsh {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/localdata/sf3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = graft.ops.SimilarityQueries.doubleVecs(spark, d)
    val queries = vecs.filter(col("vec_id") < 8)
    val n = vecs.count()
    println(s"[diag] corpus n = $n")
    for (planes <- Seq(6, 9, 11)) {
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val out = graft.sim.Similarity.lshTopK(vecs, queries, 5,
          planes = planes)
        out.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[diag] planes=$planes run$i ${dt}%.2f s")
      }
    }
    spark.stop()
  }
}
