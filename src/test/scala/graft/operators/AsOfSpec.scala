package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"), (3L, 10L, "d")
  ).toDF("k", "ts", "lv")
  private lazy val right = Seq(
    (1L, 90L, "x"), (1L, 150L, "y"), (2L, 60L, "z"), (2L, 50L, "w")
  ).toDF("k", "rts", "rv")

  private def collectBackward(tol: Option[Long] = None) =
    AsOf.joinBackward(left, right, Seq("k"), "ts", "rts", tolerance = tol)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)).map(_ => (r.getLong(3), r.getString(4)))))
      .sortBy(t => (t._1, t._2))
      .toSeq

  test("backward: latest right at-or-before each left row, per key") {
    assert(collectBackward() == Seq(
      (1L, 100L, Some((90L, "x"))),   // 90 <= 100 < 150
      (1L, 200L, Some((150L, "y"))),  // newest at-or-before 200
      (2L, 50L, Some((50L, "w"))),    // equal timestamps match (inclusive)
      (3L, 10L, None)                 // no right rows for key 3
    ))
  }

  test("backward: tolerance turns stale matches into NULL") {
    assert(collectBackward(tol = Some(20L)) == Seq(
      (1L, 100L, Some((90L, "x"))),   // 10 within tolerance
      (1L, 200L, None),               // 50 past tolerance
      (2L, 50L, Some((50L, "w"))),    // 0 within tolerance
      (3L, 10L, None)
    ))
  }

  test("forward: earliest right at-or-after each left row") {
    val rows = AsOf.joinForward(left, right, Seq("k"), "ts", "rts")
      .select("k", "ts", "asof_rts", "asof_rv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_ => (r.getLong(2), r.getString(3)))))
      .sortBy(t => (t._1, t._2))
      .toSeq
    assert(rows == Seq(
      (1L, 100L, Some((150L, "y"))),
      (1L, 200L, None),               // nothing at-or-after 200
      (2L, 50L, Some((50L, "w"))),    // inclusive
      (3L, 10L, None)
    ))
  }

  test("plan shape: one shuffle on the key, window, no join operator") {
    val plan = AsOf.joinBackward(left, right, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a window operator")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n${plan.take(600)}")
  }
}
