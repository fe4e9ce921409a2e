package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  private val Dims = 256
  private def weightOf(b: org.apache.spark.sql.Column) = (b % 7) - 3

  /** Driver-side reference of the exact model: md5-top-8-hex bucket mod
    * 256, weight (b % 7) - 3, bias 2, tokens = lowercase [\p{L}\p{N}']+.
    */
  private def refScore(text: String, bias: Long): Long = {
    val toks = "[\\p{L}\\p{N}']+".r.findAllIn(text.toLowerCase).toSeq
    toks.foldLeft(bias) { (acc, t) =>
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(t).take(8)
      val b = java.lang.Long.parseLong(hex, 16) % Dims
      acc + ((b % 7) - 3)
    }
  }

  test("classify matches a driver-side replica of the model") {
    val got = Classifier.classify(docs, "doc_id", "text", Dims, weightOf, bias = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val want = refScore(text, 2L)
      assert(got(id) == ((want, want >= 0L)), s"doc $id")
    }
  }

  test("join path computes the identical scores (two plans, one model)") {
    val weights = spark.range(Dims).select($"id".as("bucket"), ($"id" % 7 - 3).as("w"))
    val a = Classifier.classify(docs, "doc_id", "text", Dims, weightOf, bias = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = Classifier.classifyJoin(docs, "doc_id", "text", Dims, weights, "bucket", "w", bias = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a == b)
  }

  test("tokenless documents score the bare bias on both paths") {
    val empty = Seq((1L, ""), (2L, "!!! ???"), (3L, "ok"), (4L, null))
      .toDF("doc_id", "text")
    val weights = spark.range(Dims).select($"id".as("bucket"), ($"id" % 7 - 3).as("w"))
    val a = Classifier.classify(empty, "doc_id", "text", Dims, weightOf, bias = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Classifier.classifyJoin(empty, "doc_id", "text", Dims, weights, "bucket", "w", bias = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(1L) == 5L && a(2L) == 5L && a(4L) == 5L)
    assert(b == a)
  }

  test("float scores fold strictly left-to-right in token order") {
    // order-discriminating weights: one token's weight is 2^53 (the
    // absorption threshold for +1.0), the rest weigh 1.0. Left-to-right
    // from a big first token, every later +1.0 is absorbed; any other
    // association (right fold, pairwise tree) would keep some of them.
    val big = math.pow(2, 53)
    val doc = Seq((1L, "big one one one")).toDF("doc_id", "text")
    val bigBucket = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex("big").take(8)
      java.lang.Long.parseLong(hex, 16) % Dims
    }
    val w: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      b => when(b === lit(bigBucket), lit(big)).otherwise(lit(1.0))
    val got = Classifier.classify(doc, "doc_id", "text", Dims, w,
      bias = lit(0.0), threshold = lit(0.0)).collect()(0).getDouble(1)
    val leftFold = Seq(big, 1.0, 1.0, 1.0).foldLeft(0.0)(_ + _) // absorbed: == 2^53
    val rightFold = Seq(big, 1.0, 1.0, 1.0).foldRight(0.0)(_ + _) // 2^53 + 4 survives rounding
    assert(leftFold != rightFold, "fixture must discriminate fold order")
    assert(got == leftFold, s"got $got, expected the sequential left fold $leftFold")
  }

  test("float weights: projection path matches a driver replica bit-for-bit") {
    // the doc_classifier_float model: w(b) = sqrt(b+1)/8 - 1, bias 0.5 —
    // every op exactly rounded, association fixed, so Spark, DuckDB, and
    // this JVM replica agree on every bit
    val w: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      b => sqrt((b + lit(1)).cast("double")) / lit(8.0) - lit(1.0)
    val got = Classifier.classify(docs, "doc_id", "text", Dims, w,
      bias = lit(0.5), threshold = lit(40.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = docs.select($"doc_id", $"text").collect().map { r =>
      val toks = "[\\p{L}\\p{N}']+".r.findAllIn(Option(r.getString(1)).getOrElse("").toLowerCase).toSeq
      r.getLong(0) -> toks.foldLeft(0.5) { (acc, t) =>
        val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(t).take(8)
        val b = java.lang.Long.parseLong(hex, 16) % Dims
        acc + (math.sqrt((b + 1).toDouble) / 8.0 - 1.0)
      }
    }.toMap
    assert(got.size == want.size)
    val diffs = want.collect { case (id, s) if got(id) != s => id }
    assert(diffs.isEmpty, s"bitwise diffs at ids ${diffs.take(5)}")
  }

  test("dyadic-grid float weights make the join path order-independent and equal to projection") {
    // k/32 grid: partial sums stay exactly representable, so the join
    // aggregate's nondeterministic addition order cannot change the sum
    val wCol: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      b => ((b % 33) - 16).cast("double") / lit(32.0)
    val weights = spark.range(Dims).select(
      $"id".as("bucket"), (($"id" % 33 - 16).cast("double") / lit(32.0)).as("w"))
    val proj = Classifier.classify(docs, "doc_id", "text", Dims, wCol,
      bias = lit(0.25), threshold = lit(0.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val joined = Classifier.classifyJoin(docs, "doc_id", "text", Dims,
      weights, "bucket", "w", bias = lit(0.25), threshold = lit(0.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(proj == joined)
  }

  test("quantized join: arbitrary non-dyadic floats, partition-order invariant, driver-exact") {
    // weights OFF any dyadic grid: w(b) = (b % 97)/97 - 1/2
    val weights = spark.range(Dims).select(
      $"id".as("bucket"), (($"id" % 97).cast("double") / lit(97.0) - lit(0.5)).as("w"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Classifier.classifyJoinQuantized(d, "doc_id", "text", Dims,
        weights, "bucket", "w", bias = 0.25, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val a = run(docs)
    // different partitioning → different aggregation order → the LONG
    // sums must still land bit-identically
    val b = run(docs.repartition(7, $"text"))
    assert(a == b, "quantized join scores depend on partition order")
    // driver replica of the fixed-point semantic
    val scale = math.pow(2.0, 30)
    val qBias = math.floor(0.25 * scale + 0.5).toLong
    val want = docs.select($"doc_id", $"text").collect().map { r =>
      val toks = "[\\p{L}\\p{N}']+".r.findAllIn(Option(r.getString(1)).getOrElse("").toLowerCase).toSeq
      val q = toks.foldLeft(0L) { (acc, t) =>
        val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(t).take(8)
        val bk = java.lang.Long.parseLong(hex, 16) % Dims
        acc + math.floor(((bk % 97).toDouble / 97.0 - 0.5) * scale + 0.5).toLong
      }
      val score = (q + qBias).toDouble / scale
      (r.getLong(0), score, score >= 0.0)
    }.toSet
    assert(a == want, "quantized join diverged from the driver replica")
  }

  test("projection path plans with zero exchanges; join path exactly one") {
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (p.collect {
          case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(ad.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
        }).sum
      df.count() // materialize AQE
      walk(df.queryExecution.executedPlan)
    }
    val proj = Classifier.classify(docs, "doc_id", "text", Dims, weightOf)
    assert(shuffles(proj) == 0,
      s"classifier inference must be a pure projection:\n${proj.queryExecution.executedPlan}")
    val weights = spark.range(Dims).select($"id".as("bucket"), ($"id" % 7 - 3).as("w"))
    val joined = Classifier.classifyJoin(docs, "doc_id", "text", Dims, weights, "bucket", "w")
    val plan = joined.queryExecution.executedPlan.toString
    assert(shuffles(joined) == 1,
      s"weight-table inference must shuffle once (the per-doc aggregate):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the weight table must broadcast, never shuffle the corpus:\n$plan")
    // the quantized path keeps the identical plan shape: quantization is
    // a projection on the broadcast-sized weight table, never the corpus
    val fw = spark.range(Dims).select(
      $"id".as("bucket"), (($"id" % 97).cast("double") / lit(97.0) - lit(0.5)).as("w"))
    val quant = Classifier.classifyJoinQuantized(docs, "doc_id", "text", Dims, fw, "bucket", "w")
    val qplan = quant.queryExecution.executedPlan.toString
    assert(shuffles(quant) == 1 && qplan.contains("BroadcastHashJoin"),
      s"quantized join must keep the one-shuffle broadcast plan:\n$qplan")
  }
}
