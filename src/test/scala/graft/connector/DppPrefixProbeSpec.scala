package graft.connector

import graft.{GraftTables, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end runtime PREFIX narrowing on the real orders fixture — the
  * exact shape of the `bt_dpp_prefix` gate: the dim pins the leading
  * (status, priority) pair of the 3-component key through a broadcast
  * join, and at runtime the scan narrows to one prefix range per
  * surviving pair. (The dim predicate must be a RANGE on the join key —
  * an equality would constant-propagate into a static fact filter and
  * leave DPP nothing to prune.)
  */
class DppPrefixProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[BigtableScan] =
    p.collect {
      case bse: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bse.scan match {
        case s: BigtableScan => Seq(s)
        case _               => Nil
      }
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec        => allScans(q.plan)
    }.flatten

  test("bt_dpp_prefix narrows the orders scan to one prefix range per surviving pair") {
    val q = graft.SparkEntry.queries("bt_dpp_prefix")(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) == "F"),
      "only status F sorts below 'O' in the fixture")
    val scans = allScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val ranges = scans.head.currentRanges
    assert(ranges.size == rows.length, s"one prefix range per surviving pair, got $ranges")
    assert(ranges.forall(r => r.startKey.startsWith("F#") && r.startKey.endsWith("#")),
      s"prefix ranges must be separator-terminated F#<priority># prefixes: $ranges")
  }
}
