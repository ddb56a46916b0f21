package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-catalog operations over a warehouse directory — the engine
  * analog of the reference's topic lifecycle (SURVEY.md §2.A S5, K2, K4):
  * `list-topics` (`/root/reference/bin/kafka-client.sh:5-23`),
  * auto-created per-table topics (`bin/msk-cluster.sh:67-70`), and
  * regex-scoped `clean-topics` (`bin/kafka-client.sh:50-68`,
  * `bin/mskc-connector.sh:97-114`).
  *
  * A "table" is a parquet directory under the warehouse root, named like
  * a topic (`{prefix}.{db}.{table}`). Listing/dropping are driver-side
  * metadata ops; data never moves.
  */
final class EngineCatalog(spark: SparkSession, warehouse: String) {

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** Auto-create-on-write (K2): writing to a table name materializes it. */
  def write(table: String, df: DataFrame, mode: String = "append"): Unit =
    df.write.mode(mode).parquet(s"$warehouse/$table")

  def read(table: String): DataFrame =
    spark.read.parquet(s"$warehouse/$table")

  /** S5 — the catalog scan, as a DataFrame so it composes with filters. */
  def tables(): DataFrame = {
    val root = new Path(warehouse)
    val names =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
    import spark.implicits._
    names.toDF("table_name")
  }

  /** F2 — regex selection, same shape as the reference's topic regexes. */
  def tablesMatching(pattern: String): Seq[String] =
    tables().filter(col("table_name").rlike(pattern))
      .collect().map(_.getString(0)).toSeq

  /** K4 — regex-scoped destructive cleanup; returns dropped names. */
  def dropTables(pattern: String): Seq[String] = {
    val doomed = tablesMatching(pattern)
    doomed.foreach(t => fs.delete(new Path(s"$warehouse/$t"), true))
    doomed
  }
}
