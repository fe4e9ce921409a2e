package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 data-size-adaptive partition count (VERDICT r18 #3):
  * floor at defaultParallelism, scale with bytes/target, degrade to the
  * floor on unknown/placeholder statistics, relative cap at 64 × cores.
  */
class SpreadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cores = spark.sparkContext.defaultParallelism

  test("scaledPartitions floors at defaultParallelism for small inputs") {
    assert(Spread.scaledPartitions(spark, BigInt(1)) == cores)
    assert(Spread.scaledPartitions(spark, BigInt(64L * 1024 * 1024)) == cores)
  }

  test("scaledPartitions scales with bytes past the floor") {
    val target = Spread.DefaultTargetPartitionBytes
    val want = 4L * cores
    assert(Spread.scaledPartitions(spark, BigInt(want * target)) == want)
    // ceil division: one byte past N partitions needs N+1
    assert(Spread.scaledPartitions(spark, BigInt(want * target + 1)) == want + 1)
  }

  test("scaledPartitions degrades to the floor on unknown stats and caps at 64x cores") {
    assert(Spread.scaledPartitions(spark, BigInt(-1)) == cores)
    assert(Spread.scaledPartitions(spark, BigInt(0)) == cores)
    // defaultSizeInBytes placeholder (Long.MaxValue) must NOT explode
    assert(Spread.scaledPartitions(spark, BigInt(Long.MaxValue)) == cores)
    // an enormous (but sub-placeholder) estimate is capped relative to cores
    assert(Spread.scaledPartitions(spark, BigInt(Long.MaxValue) / 8) == 64 * cores)
  }

  test("scaledPartitions honors the target-bytes conf knob") {
    val conf = Spread.TargetPartitionBytesConf
    spark.conf.set(conf, (1024L * 1024).toString) // 1 MB target
    try {
      val n = Spread.scaledPartitions(spark, BigInt(10L * 1024 * 1024 * cores))
      assert(n == 10L * cores, s"10 MB/core at 1 MB target should give 10*cores, got $n")
    } finally spark.conf.unset(conf)
  }
}
