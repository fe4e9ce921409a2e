package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bin join equals cartesian-filter ground truth across bin widths") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 200).map(i => (i.toLong, rnd.nextInt(10000).toLong)).toDF("pid", "p")
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(500).toLong)
    }.toDF("iid", "lo", "hi")
    val expected = pts.crossJoin(ivs)
      .where($"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 100L, 500L, 10000L)) {
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", w)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == expected, s"w=$w diverged from ground truth")
    }
  }

  test("inverted intervals match nothing instead of crashing sequence()") {
    val pts = Seq((1L, 50L)).toDF("pid", "p")
    val ivs = Seq((10L, 100L, 0L), (11L, 40L, 60L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 10L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L)))
  }

  test("optional equi keys restrict matches per key") {
    val pts = Seq((1L, "a", 50L), (2L, "b", 50L)).toDF("pid", "k", "p")
    val ivs = Seq((10L, "a", 0L, 100L)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 10L, keyCols = Seq("k"))
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("plan is an equi join on the bin, not a nested-loop cartesian") {
    val pts = (1 to 50).map(i => (i.toLong, i.toLong * 7)).toDF("pid", "p")
    val ivs = (1 to 20).map(i => (i.toLong, i.toLong * 10, i.toLong * 10 + 30)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a cartesian:\n${plan.take(500)}")
  }
}
