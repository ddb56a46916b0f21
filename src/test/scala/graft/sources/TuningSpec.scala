package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The cluster-shape math behind Tuning.recommended: data-driven
  * partition counts with a parallelism floor and a tracking-overhead
  * cap.
  */
class TuningSpec extends AnyFunSuite {

  private val TB = 1L << 40

  test("partition count is data-driven between floor and cap") {
    // 1 TB on 100×8 cores: 8192 data-driven partitions > 1600 floor
    assert(Tuning.shufflePartitions(1 * TB, 100, 8) === 8192L)
    // tiny input floors at 2× parallelism
    assert(Tuning.shufflePartitions(1L << 20, 100, 8) === 1600L)
    // 100 TB caps at 200k (819200 data-driven)
    assert(Tuning.shufflePartitions(100 * TB, 1000, 8) === 200000L)
    // monotone in input size up to the cap
    val sizes = Seq(1L << 30, 1L << 35, 1L << 40, 1L << 45)
      .map(Tuning.shufflePartitions(_, 100, 8))
    assert(sizes === sizes.sorted)
  }

  test("recommended conf keeps AQE on and sizes consistent") {
    val conf = Tuning.recommended(100 * TB, 1000, 8)
    assert(conf("spark.sql.adaptive.enabled") === "true")
    assert(conf("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(conf("spark.sql.shuffle.partitions").toLong === 200000L)
    // advisory AQE size ≤ scan/shuffle targets (coalesce never inflates)
    assert(conf("spark.sql.adaptive.advisoryPartitionSizeInBytes").toLong
      <= conf("spark.sql.files.maxPartitionBytes").toLong)
    // broadcast threshold stays well under a partition target
    assert(conf("spark.sql.autoBroadcastJoinThreshold").toLong
      < Tuning.TargetPartitionBytes)
  }
}
