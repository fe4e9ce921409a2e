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

  test("saltedJoin equals the plain join on a skewed key (inner and left)") {
    val left = spark.range(5000)
      .select(when($"id" % 10 < 9, "hot").otherwise(concat(lit("k"), $"id" % 7)).as("k"), $"id".as("v"))
    val right = Seq(("hot", 1L), ("k0", 2L), ("k3", 3L), ("nomatch", 9L)).toDF("k", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sorted.toSeq
    val plainInner = canon(left.join(right, Seq("k")))
    val saltedInner = canon(Skew.saltedJoin(left, right, Seq("k"), saltBuckets = 8))
    assert(saltedInner == plainInner && plainInner.nonEmpty)
    val plainLeft = canon(left.join(right, Seq("k"), "left"))
    val saltedLeft = canon(Skew.saltedJoin(left, right, Seq("k"), saltBuckets = 8, joinType = "left"))
    assert(saltedLeft == plainLeft)
    assert(saltedLeft.exists(_._3 == -1L), "unmatched left rows must survive with NULLs")
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    val left = spark.range(4000).repartition(4).select(lit("hot").as("k"), $"id".as("v"))
    val right = Seq(("hot", 1L)).toDF("k", "w")
    // the same salt expression the operator applies: a single hot key
    // must land in (nearly) all 8 buckets, i.e. 8 reducer groups
    val spread = left
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .select(countDistinct($"__salt")).head().getLong(0)
    assert(spread >= 7, s"hot key spread across only $spread of 8 buckets")
    assert(Skew.saltedJoin(left, right, Seq("k"), saltBuckets = 8).count() == 4000)
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
