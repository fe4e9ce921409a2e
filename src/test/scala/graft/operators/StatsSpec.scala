package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("collect reports exact counts, nulls, extrema and NDV below k") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")), (5L, None)
    ).toDF("id", "s")
    val out = Stats.collect(df, Seq("id", "s"), ndvK = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("id") == ((5L, 0L, 5L, "1", "5")))
    // NDV ignores NULLs (the xxhash64-of-null bucket is subtracted)
    assert(out("s") == ((5L, 2L, 2L, "a", "b")))
  }

  test("one scan, map-side combined: a repartitioned input gives identical stats") {
    val df = spark.range(2000).select($"id", ($"id" % 37).as("m"))
    val a = Stats.collect(df.repartition(13), Seq("id", "m")).collect().map(_.toSeq).toSet
    val b = Stats.collect(df.coalesce(1), Seq("id", "m")).collect().map(_.toSeq).toSet
    assert(a == b)
    val m = Stats.collect(df, Seq("m")).head()
    assert(m.getLong(3) == 37L)
  }
}
