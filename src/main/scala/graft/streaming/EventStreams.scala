package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured-Streaming operators over the `events` stream shape
  * (TESTDATA.md: event_id, ts, user_id, event_type, value). The
  * reference has no streaming surface (SURVEY.md §2B: batch collect
  * only); this tier is the north-star extension — watermarked window
  * aggregation and custom session state via the standard
  * `readStream → transform → writeStream` model, so the same code runs
  * over Kafka/file/rate sources on a cluster.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp, session_end: java.sql.Timestamp, n_events: Int, total_value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, total: Double)

  /** Tumbling-window counts per event type with a watermark: late rows
    * beyond `watermarkDelay` are dropped, state is bounded — the
    * standard windowed-agg shape that scales by (window, type) key.
    */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour", watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("total_value"))

  /** Streaming exact deduplication — the LLM-pipeline dedup tier's
    * streaming face. Append mode emits each distinct key combination
    * once, at first sight.
    *
    * `withinWatermark = false` keeps exact global dedup (state grows
    * with distinct keys — fine when the key space is bounded, e.g.
    * (user, event_type)). `true` switches to
    * `dropDuplicatesWithinWatermark`: duplicates are only suppressed
    * while inside the watermark window, so state is bounded by event
    * time — the 100 TB/unbounded-stream path.
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermarkDelay: String = "2 hours",
      withinWatermark: Boolean = false
  ): DataFrame =
    if (withinWatermark)
      events.withWatermark(tsCol, watermarkDelay).dropDuplicatesWithinWatermark(keyCols)
    else
      events.dropDuplicates(keyCols)

  /** Gap-based sessionization with explicit state:
    * `flatMapGroupsWithState` keyed by user, event-time timeout at
    * watermark + gap. Emits a session row when the gap elapses.
    * State per key is O(1) (running aggregates only).
    */
  def sessionize(
      spark: SparkSession,
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"
  ): Dataset[Session] = {
    import spark.implicits._

    def updateState(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]
    ): Iterator[Session] = {
      val gapMs = gapMinutes * 60L * 1000L
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        val s = state.get
        out += Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.total)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
            case Some(s) =>
              out += Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
