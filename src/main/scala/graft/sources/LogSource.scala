package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-corpus scanning (SURVEY.md §2.A S6 + F3): the engine-native form
  * of `find-mskc-connector-log-errors`
  * (`/root/reference/bin/mskc-connector.sh:491-499`), which downloads
  * gzipped connector logs from S3 and greps them case-insensitively for
  * `error|failed|exception`.
  *
  * `spark.read.text` decompresses .gz transparently and recurses the
  * prefix — the whole "download, gunzip, grep" loop becomes one
  * distributed scan with the filter evaluated next to the data.
  */
object LogSource {

  val ErrorPattern = "error|failed|exception"

  /** All log lines under `path` (recursively; .gz decoded), with their
    * source file for provenance.
    */
  def scan(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      .text(path)
      .select(col("value").as("line"),
        input_file_name().as("file"))

  /** The reference's error sweep: case-insensitive regex over the corpus. */
  def findErrors(spark: SparkSession, path: String,
                 pattern: String = ErrorPattern): DataFrame =
    scan(spark, path).filter(lower(col("line")).rlike(pattern))
}
