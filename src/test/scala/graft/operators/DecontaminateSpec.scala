package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.{SparkPlan, adaptive}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // a 13-token benchmark sentence planted verbatim into some train docs
  private val leak = "the quick brown fox jumps over the lazy dog near the old barn"
  private val bench = Seq(
    (100L, s"Benchmark question: $leak?"),
    (101L, "Totally unrelated benchmark prompt about astronomy and telescopes and more")
  ).toDF("doc_id", "text")
  private val train = Seq(
    (1L, s"Some crawl page. $leak. And trailing junk tokens here."), // contaminated
    (2L, "the quick brown fox jumps over the lazy dog"),             // only 9 tokens shared — no 13-gram
    (3L, s"prefix words $leak suffix words"),                        // contaminated
    (4L, "completely clean document with no overlap whatsoever in any window of thirteen tokens")
  ).toDF("doc_id", "text")

  test("flags exactly the documents sharing a 13-gram, counting distinct shared grams") {
    val out = Decontaminate.contaminated(train, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 3L))
    // doc 1: "$leak" inside a longer sentence shares every 13-window that
    // stays within the planted sentence; bench doc has "benchmark question
    // the ... barn" so shared grams are windows fully inside `leak`= exactly 1
    assert(out(1L) >= 1L && out(3L) >= 1L)
  }

  test("ngram counting matches a hand computation") {
    // bench text "a b c d e f g h i j k l m n" has 14 tokens -> two 13-grams
    val b2 = Seq((1L, "a b c d e f g h i j k l m n")).toDF("doc_id", "text")
    val t2 = Seq((2L, "x a b c d e f g h i j k l m n y")).toDF("doc_id", "text")
    val out = Decontaminate.contaminated(t2, "doc_id", "text", b2, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 2L)) // both of the bench's 13-grams appear
  }

  test("decontaminate drops flagged docs and keeps the rest") {
    val kept = Decontaminate.decontaminate(train, "doc_id", "text", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("documents shorter than n tokens produce no grams and never match") {
    val tiny = Seq((7L, "short doc")).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(tiny, "doc_id", "text", bench, "text").count() == 0)
    val grams = tiny.select(Decontaminate.ngramSet(col("text"), 13).as("g"))
      .selectExpr("size(g)").as[Int].head()
    assert(grams == 0)
  }

  test("broadcastFlagged=false degrades the anti join to a shuffle join (same rows)") {
    // pin the plan: disable auto-broadcast so only explicit hints broadcast
    val prevStatic = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prevStatic)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Decontaminate.decontaminate(train, "doc_id", "text", bench, "text",
        broadcastFlagged = false)
      assert(df.select($"doc_id").as[Long].collect().toSet == Set(2L, 4L))
      def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: adaptive.AdaptiveSparkPlanExec => a.executedPlan +: collectPlan(a.executedPlan)
        case q: adaptive.QueryStageExec => q.plan +: collectPlan(q.plan)
        case other => other +: other.children.flatMap(collectPlan)
      }
      val nodes = collectPlan(df.queryExecution.executedPlan)
      val antiBroadcast = nodes.collect {
        case j: BroadcastHashJoinExec if j.joinType.toString == "LeftAnti" => j
      }
      assert(antiBroadcast.isEmpty,
        "with broadcastFlagged=false and auto-broadcast off, the anti join must be shuffle-based")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevStatic)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
  }

  test("benchmark gram set is broadcast: the corpus side is never shuffled before the join") {
    val df = Decontaminate.contaminated(train, "doc_id", "text", bench, "text")
    df.collect()
    def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: adaptive.AdaptiveSparkPlanExec => a.executedPlan +: collectPlan(a.executedPlan)
      case q: adaptive.QueryStageExec => q.plan +: collectPlan(q.plan)
      case other => other +: other.children.flatMap(collectPlan)
    }
    val nodes = collectPlan(df.queryExecution.executedPlan)
    val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "expected the gram join to be a BroadcastHashJoin")
    // the only exchange allowed below the join is the broadcast build side;
    // the probe (corpus) side must reach the join shuffle-free
    val joinShuffles = bhj.head.collect { case s: ShuffleExchangeExec => s }
    assert(joinShuffles.isEmpty, "corpus side must not shuffle before the gram join")
  }

  // ---- semantic (embedding-space) decontamination ----

  private val semBench = Seq(
    (100L, Seq(1.0, 0.0, 0.0, 0.0)),
    (101L, Seq(0.0, 1.0, 0.0, 0.0))
  ).toDF("vec_id", "embedding")
  private val semTrain = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),   // exact copy of bench 100 -> cos 1.0
    (2L, Seq(0.9, 0.1, 0.0, 0.0)),   // cos vs bench 100 = 0.9939 -> flagged at 0.9
    (3L, Seq(0.0, 0.0, 1.0, 0.0)),   // orthogonal to both -> clean
    (4L, Seq(0.6, 0.8, 0.0, 0.0))    // cos 0.6 / 0.8 -> clean at 0.9
  ).toDF("vec_id", "embedding")

  test("semanticContaminated flags exactly the docs within cosine threshold of any bench vector") {
    val out = Decontaminate.semanticContaminated(
      semTrain, "vec_id", "embedding", semBench, "embedding", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - 1.0) < 1e-9)
    assert(math.abs(out(2L)._2 - 0.9 / math.sqrt(0.82)) < 1e-9)
  }

  test("semanticDecontaminate keeps exactly the complement") {
    val kept = Decontaminate.semanticDecontaminate(
      semTrain, "vec_id", "embedding", semBench, "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("semantic exact path: broadcastBenchmark=false returns identical rows") {
    val a = Decontaminate.semanticContaminated(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9)
      .collect().map(_.toSeq).toSet
    val b = Decontaminate.semanticContaminated(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9,
      broadcastBenchmark = false)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("broadcast-size guard: over-budget benchmark plans no BroadcastNestedLoopJoin") {
    // force the guard with a 1-byte budget: the exact BNLJ path must be
    // replaced by the IVF-bucketed plan (equi-join on bucket id), and —
    // with few vectors, where every bench vector probes every bucket —
    // the flagged set still equals the exact path's
    val guarded = Decontaminate.semanticContaminated(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9,
      maxBroadcastBytes = 1L)
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val sub = p match {
        case a: adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: adaptive.QueryStageExec        => Seq(q.plan)
        case other                             => other.children
      }
      p +: sub.flatMap(nodes)
    }
    assert(!nodes(guarded.queryExecution.executedPlan)
      .exists(_.getClass.getSimpleName.contains("BroadcastNestedLoopJoin")),
      "guarded path must not plan a BroadcastNestedLoopJoin")
    val exact = Decontaminate.semanticContaminated(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(guarded.select("vec_id").as[Long].collect().toSet == exact)

    // under budget the exact broadcast plan survives untouched
    val under = Decontaminate.semanticContaminated(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9)
    assert(nodes(under.queryExecution.executedPlan)
      .exists(_.getClass.getSimpleName.contains("BroadcastNestedLoopJoin")))

    // the decontaminate (anti) surface takes the same guard
    val keptGuarded = Decontaminate.semanticDecontaminate(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9,
      maxBroadcastBytes = 1L)
    assert(keptGuarded.select("vec_id").as[Long].collect().toSet == Set(3L, 4L))
    assert(!nodes(keptGuarded.queryExecution.executedPlan)
      .exists(_.getClass.getSimpleName.contains("BroadcastNestedLoopJoin")))
  }

  test("semanticContaminatedIvf never invents matches, and probing every bucket equals exact") {
    // bucket pruning can only LOSE pairs (a bench vector not probing the
    // corpus row's bucket), never add them: flagged(ivf) must be a subset
    // of flagged(exact) at any nProbe, and equal at nProbe = nCentroids.
    val exact = Decontaminate.semanticContaminated(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9)
      .select("vec_id").as[Long].collect().toSet
    val pruned = Decontaminate.semanticContaminatedIvf(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9,
      nCentroids = 2, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(pruned.subsetOf(exact))
    val full = Decontaminate.semanticContaminatedIvf(
      semTrain, "vec_id", "embedding", semBench, "embedding", 0.9,
      nCentroids = 2, nProbe = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact)
  }
}
