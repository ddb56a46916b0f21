package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout for co-located joins (SURVEY.md "Partitioning &
  * shuffle": bucketing for co-located joins; the reference's analog is
  * topic-per-table + keyed produce, which pre-partitions every change
  * stream by PK before any consumer runs).
  *
  * Writing both sides of a recurring join bucketed by the join key on
  * the same bucket count removes the exchange from EVERY subsequent
  * join/aggregation on that key — at 100 TB that's the difference
  * between an in-place merge and re-shuffling the lake per query.
  */
object Layout {

  /** Write `df` as a bucketed, bucket-sorted table in the session
    * catalog. `saveAsTable` is required — bucketing metadata lives in
    * the catalog, not in parquet itself.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog forgets tables across sessions but leaves
    // their managed location behind; clear it or saveAsTable refuses
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
