package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedCount equals plain groupBy count on a skewed key distribution") {
    // 90% of rows share one hot key
    val df = spark.range(10000)
      .select(when($"id" % 10 < 9, "hot").otherwise(concat(lit("k"), $"id" % 7)).as("k"))
    val expected = df.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, Seq("k"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == expected)
  }

  test("saltedAgg supports sum/min/max merge shapes") {
    val df = spark.range(1000).select(($"id" % 3).as("k"), $"id".as("v"))
    val out = Skew.saltedAgg(df, Seq("k"), 4)(
      "total" -> (sum($"v"), (cs: Seq[org.apache.spark.sql.Column]) => sum(cs.head)),
      "mx" -> (max($"v"), (cs: Seq[org.apache.spark.sql.Column]) => max(cs.head)),
      "mn" -> (min($"v"), (cs: Seq[org.apache.spark.sql.Column]) => min(cs.head))
    ).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exp = df.groupBy($"k").agg(sum($"v"), max($"v"), min($"v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == exp)
  }
}
