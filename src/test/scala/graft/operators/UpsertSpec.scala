package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 0L, false), (2L, "b", 0L, false), (3L, "c", 0L, false)
  ).toDF("k", "v", "version", "deleted")

  test("updates override, inserts appear, untouched base rows survive") {
    val changes = Seq(
      (2L, "b2", 1L, false), // update
      (9L, "new", 1L, false) // insert
    ).toDF("k", "v", "version", "deleted")
    val out = Upsert.mergeLatest(base, changes, Seq("k"), "version", Some("deleted"))
      .select($"k", $"v", $"version").as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", 0L), (2L, "b2", 1L), (3L, "c", 0L), (9L, "new", 1L)))
  }

  test("highest version wins among multiple changes; delete then re-insert resurrects") {
    val changes = Seq(
      (1L, "a1", 1L, false), (1L, "a2", 2L, false),  // two updates, v2 wins
      (2L, "xx", 1L, true),                          // delete
      (3L, "zz", 1L, true), (3L, "c3", 2L, false)    // delete then re-insert
    ).toDF("k", "v", "version", "deleted")
    val out = Upsert.mergeLatest(base, changes, Seq("k"), "version", Some("deleted"))
      .select($"k", $"v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a2"), (3L, "c3")))
  }

  test("merge is one aggregate shuffle: no window, partial combine before the exchange") {
    val changes = Seq((2L, "b2", 1L, false)).toDF("k", "v", "version", "deleted")
    val df = Upsert.mergeLatest(base, changes, Seq("k"), "version", Some("deleted"))
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan +: nodes(a.executedPlan)
      case q: QueryStageExec => q.plan +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val all = nodes(df.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[WindowExec]), "upsert must not need a window")
    // AQE traversal can reach the same stage through two paths — count
    // distinct exchange nodes, not visits
    val exchanges = all.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.distinct
    assert(exchanges.size == 1, s"expected one key shuffle, got ${exchanges.size}")
    // map-side partial: an aggregate runs BELOW the exchange
    assert(exchanges.head.child.collectFirst {
      case p if p.getClass.getSimpleName.contains("Aggregate") => p
    }.isDefined, "partial aggregation must run before the shuffle")
  }

  test("versionDominates: a late lower-version change neither overwrites nor resurrects") {
    // base is a maintained snapshot whose rows carry their ORIGINAL versions
    val snap = Seq(
      (1L, "a-v5", 5L, false), // newer than the late change below
      (2L, "b-del", 7L, true)  // tombstone at v7
    ).toDF("k", "v", "version", "deleted")
    val late = Seq(
      (1L, "a-v3", 3L, false), // late: must NOT overwrite v5
      (2L, "b-v4", 4L, false), // late: must NOT resurrect the v7 tombstone
      (3L, "c-v1", 1L, false)  // genuinely new key: inserts
    ).toDF("k", "v", "version", "deleted")
    val merged = Upsert.mergeLatest(snap, late, Seq("k"), "version",
      deleteCol = None, versionDominates = true)
    val out = merged.select($"k", $"v", $"version", $"deleted")
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "a-v5", 5L, false),
      (2L, "b-del", 7L, true), // tombstone survives the merge
      (3L, "c-v1", 1L, false)))
    // equal versions: the change (__prio 1) wins the tie — re-running the
    // same batch is idempotent and deterministic
    val replay = Seq((1L, "a-v5-replay", 5L, false)).toDF("k", "v", "version", "deleted")
    val tied = Upsert.mergeLatest(snap, replay, Seq("k"), "version",
      deleteCol = None, versionDominates = true)
      .where($"k" === 1L).select($"v").as[String].collect().toSeq
    assert(tied == Seq("a-v5-replay"))
  }

  test("schema mismatch is rejected") {
    val bad = Seq((1L, "a", 0L)).toDF("k", "v", "version")
    intercept[IllegalArgumentException] {
      Upsert.mergeLatest(base, bad, Seq("k"), "version")
    }
  }
}
