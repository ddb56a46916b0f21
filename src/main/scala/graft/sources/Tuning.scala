package graft.sources

/** Cluster-scale configuration the engine recommends for a real
  * deployment (SURVEY.md §7.2 / SCALE.md "Known limits": the local
  * harness pins `shuffle.partitions=32` for local[32]; a 100 TB run
  * does NOT — it derives sizes from data volume and cluster shape).
  * Everything here is a public Spark conf; nothing in the engine
  * hard-codes a partition count, so this map is the only thing that
  * changes between the sandbox and a 1000-executor cluster.
  */
object Tuning {

  /** Target post-shuffle partition size: small enough to fit executor
    * memory with room for sort/agg state, big enough to amortize task
    * overhead.
    */
  val TargetPartitionBytes: Long = 128L << 20

  /** Shuffle-partition count for `inputBytes` of data on
    * `executors × coresPerExecutor` cores: data-driven
    * (bytes / 128 MiB), floored at 2× total parallelism (every core
    * busy even after AQE coalescing), capped at 200k (scheduler/shuffle
    * tracking overhead dominates beyond that — beyond the cap AQE's
    * advisory size still right-sizes actual partitions).
    */
  def shufflePartitions(inputBytes: Long, executors: Int,
                        coresPerExecutor: Int): Long = {
    val parallelism = executors.toLong * coresPerExecutor
    val byData = inputBytes / TargetPartitionBytes
    math.min(math.max(byData, parallelism * 2L), 200000L)
  }

  /** The conf block for a deployment at the given scale. AQE stays the
    * runtime corrector (coalescing, skew-join splits, runtime
    * broadcast) — these settings give it the right starting point.
    */
  def recommended(inputBytes: Long, executors: Int,
                  coresPerExecutor: Int): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" ->
      shufflePartitions(inputBytes, executors, coresPerExecutor).toString,
    "spark.sql.files.maxPartitionBytes" -> TargetPartitionBytes.toString,
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
      (64L << 20).toString,
    "spark.sql.autoBroadcastJoinThreshold" -> (32L << 20).toString,
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer")
}
