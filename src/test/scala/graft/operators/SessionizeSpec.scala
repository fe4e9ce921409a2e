package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Min = 60L * 1000000 // µs

  test("splits a timeline at gaps strictly greater than gapMicros") {
    val events = Seq(
      // user a: 0, 10min (gap 10 <= 30: same), 40min (gap 30 == 30: SAME,
      // continuation rule is <=), 71min (gap 31 > 30: new session)
      ("a", 0L, 1.0), ("a", 10 * Min, 2.0), ("a", 40 * Min, 3.0), ("a", 71 * Min, 4.0),
      ("b", 5 * Min, 9.0)
    ).toDF("u", "ts", "v")
    val got = Sessionize.assign(events, "u", "ts", "v", gapMicros = 30 * Min)
      .orderBy($"u", $"session_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(got == Seq(
      ("a", 1L, 0L, 40 * Min, 3L, 6.0),
      ("a", 2L, 71 * Min, 71 * Min, 1L, 4.0),
      ("b", 1L, 5 * Min, 5 * Min, 1L, 9.0)))
  }

  test("sessions partition the events: counts sum to the input size, no session overlaps the gap") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 2000).map { i =>
      (s"u${i % 17}", rnd.nextInt(100000).toLong * 1000, 1.0)
    }.toDF("u", "ts", "v")
    val sessions = Sessionize.assign(events, "u", "ts", "v", gapMicros = 1000000L).cache()
    assert(sessions.agg(sum($"n_events")).head().getLong(0) == 2000L)
    // consecutive sessions of the same user are separated by > gap
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"u").orderBy($"session_id")
    val bad = sessions
      .withColumn("prev_end", lag($"session_end_us", 1).over(w))
      .where($"prev_end".isNotNull && $"session_start_us" - $"prev_end" <= 1000000L)
    assert(bad.count() == 0)
  }
}
