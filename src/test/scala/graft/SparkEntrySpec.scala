package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: entry() returns rows on sf0.001 and
  * every registered query runs (the oracle hash-compare itself is the
  * driver's job; tools/check_correctness.py mimics it locally).
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry() runs the flagship query with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all registered queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      withClue(name) { assert(n >= 0) }
    }
  }
}
