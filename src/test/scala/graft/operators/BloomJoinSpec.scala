package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The rel_bloom_join gate proves VALUES; this spec proves the PLAN —
  * Catalyst's InjectRuntimeFilter must have turned the dimension side's
  * selective predicate into a bloom filter applied on the fact side.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("rel_bloom_join plan applies might_contain on the fact side") {
    val df = graft.SparkEntry.queries("rel_bloom_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a runtime bloom filter in:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), "join should remain a shuffle join")
    df.count() // and it still executes
  }

  test("threshold override is restored after the query builds") {
    val key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val before = spark.conf.getOption(key)
    graft.SparkEntry.queries("rel_bloom_join")(spark, "/root/testdata/sf0.001")
    assert(spark.conf.getOption(key) == before)
  }
}
