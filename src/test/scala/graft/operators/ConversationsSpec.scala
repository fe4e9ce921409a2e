package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ConversationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Gap = 1000L // µs

  private def assemble(rows: Seq[(Long, Long, Long, String)]) =
    Conversations.assemble(
      rows.toDF("user_id", "ts_us", "event_id", "turn"),
      "user_id", "ts_us", "event_id", "turn", gapMicros = Gap)

  test("splits at gaps and serializes turns in time order") {
    val out = assemble(Seq(
      (1L, 100L, 1L, "a"), (1L, 600L, 2L, "b"), (1L, 900L, 3L, "c"),
      (1L, 5000L, 4L, "d"), // gap > 1000 → new conversation
      (2L, 50L, 5L, "x")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(out((1L, 1L)) == ((100L, 900L, 3L, "a > b > c")))
    assert(out((1L, 2L)) == ((5000L, 5000L, 1L, "d")))
    assert(out((2L, 1L)) == ((50L, 50L, 1L, "x")))
  }

  test("tied timestamps break by sequence id; same conversation either way") {
    val out = assemble(Seq(
      (1L, 100L, 9L, "late"), (1L, 100L, 2L, "early"), (1L, 200L, 5L, "mid")))
      .collect().map(r => r.getString(5))
    assert(out.toSeq == Seq("early > late > mid"))
  }

  test("boundary: gap exactly gapMicros continues the conversation") {
    val out = assemble(Seq((1L, 0L, 1L, "a"), (1L, Gap, 2L, "b"), (1L, 2 * Gap + 1, 3L, "c")))
      .collect().map(r => (r.getLong(1), r.getString(5))).toMap
    assert(out(1L) == "a > b" && out(2L) == "c")
  }

  test("exactly ONE exchange: the aggregate reuses the window's user partitioning") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", org.apache.spark.sql.functions.unix_micros($"ts".cast("timestamp")).as("ts_us"),
        $"event_id", $"event_type")
    val convs = Conversations.assemble(
      events, "user_id", "ts_us", "event_id", "event_type", gapMicros = 30L * 60 * 1000000)
    convs.count() // materialize AQE
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p.collect {
        case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shuffles(ad.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => shuffles(q.plan)
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      }).sum
    assert(shuffles(convs.queryExecution.executedPlan) == 1,
      s"window + grouped assembly must share one user-key shuffle:\n${convs.queryExecution.executedPlan}")
  }

  test("matches the Sessionize gap rule on real events (counts per conversation)") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", org.apache.spark.sql.functions.unix_micros($"ts".cast("timestamp")).as("ts_us"),
        $"event_id", $"event_type", $"value")
    val gapUs = 30L * 60 * 1000000
    val viaSessionize = Sessionize.assign(events, "user_id", "ts_us", "value", gapUs)
      .select($"user_id", $"session_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaAssemble = Conversations
      .assemble(events, "user_id", "ts_us", "event_id", "event_type", gapUs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(viaAssemble == viaSessionize)
    // transcripts carry exactly n_turns serialized turns
    val turns = Conversations
      .assemble(events, "user_id", "ts_us", "event_id", "event_type", gapUs)
      .collect().foreach { r =>
        assert(r.getString(5).split(" > ").length == r.getLong(4))
      }
  }
}
