package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session/codegen/scheduler/datasource spin-up is not
    // query cost, and must not be attributed to whichever query runs first.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()
    // Each query is materialized through the noop sink (full row
    // production, no count() short-circuits, no disk cost) and run TWICE:
    // the first run pays one-time plan compilation + codegen + JIT, the
    // second measures data work — which is what the baseline's stage
    // times record and what a resident 100 TB pipeline would see. Report
    // min(run1, run2); keep the cold number in "queries_cold".
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val cold = runOnce(fn)
        val warm = runOnce(fn)
        (name, math.min(cold, warm), cold, true)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        (name, 0.0, 0.0, false)
      }
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsCold = results.map { case (k, _, c, _) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
