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

  /** Small-file compaction — the lake-maintenance pass that keeps scan
    * parallelism healthy: a FLAT parquet directory accumulated as
    * thousands of tiny files (streaming micro-batches) is rewritten as
    * ⌈totalBytes / targetFileBytes⌉ right-sized files. Sizing comes
    * from a filesystem content summary (no data read; marker-file
    * bytes are noise relative to any sane target); the single data
    * pass is read → round-robin repartition → write. The caller swaps
    * the directory in (or points readers at `outDir`) — pairing with
    * an atomic pointer flip ([[PointerFile]]) where readers need
    * isolation, as the CDC sink and IVF index do.
    *
    * Hive-partitioned layouts compact PER PARTITION DIRECTORY (call
    * once per leaf dir — bounded jobs, layout preserved); compacting
    * the root would flatten the partition columns into data.
    */
  def compactFiles(spark: SparkSession, srcDir: String, outDir: String,
                   targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0")
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(src).getLength
    // bounded toInt: a tiny target over a huge directory must not wrap
    // negative through Int overflow
    val nFiles = math.min(
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes),
      1L << 28).toInt
    spark.read.parquet(srcDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Z-ordered parquet layout: range-normalize two columns to
    * `[0, 2^bits)`, Morton-interleave them, and range-partition + sort
    * the files by the z-value. Every file's min/max is then narrow in
    * BOTH columns, so parquet row-group/file skipping fires for a
    * predicate on EITHER — the multi-dimensional generalization of
    * "sort by the filter column" that a single sort key cannot give.
    * At 100 TB this is the difference between a point lookup reading a
    * handful of files and scanning the lake on the non-leading key.
    *
    * The min/max pass is one tiny agg job; normalization skew (hot
    * ranges) degrades clustering, not correctness — the data itself is
    * unchanged, only its file placement.
    */
  def writeZOrdered(df: DataFrame, dir: String,
                    colA: String, colB: String,
                    bits: Int = 16, numFiles: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.Native
    val mm = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head()
    // empty input / all-null column ⇒ no ranges to normalize: degrade
    // to a plain write instead of NPE-ing on the null min/max
    if (mm.isNullAt(0) || mm.isNullAt(2)) {
      df.write.mode("overwrite").parquet(dir)
      return
    }
    val scaleMax = (1L << bits) - 1
    def norm(c: String, lo: Double, hi: Double) =
      if (!(hi > lo)) lit(0L)
      else least(lit(scaleMax), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) * scaleMax / (hi - lo))
          .cast("long")))
    val z = Native.morton(
      norm(colA, mm.getDouble(0), mm.getDouble(1)),
      norm(colB, mm.getDouble(2), mm.getDouble(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
