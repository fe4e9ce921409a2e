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
    * State per key is O(1) (running aggregates only). Session bounds
    * keep full microsecond precision. Late-but-within-watermark
    * arrivals follow the batch semantics exactly as
    * [[assembleConversations]]: a pre-start event within the gap
    * merges and LOWERS session_start; one more than a gap before the
    * open session's start closes as its own session (batch parity for
    * a lone event; several such events clustered within a gap of each
    * other but arriving after the session opened each emit singly
    * where batch would merge them — the same documented divergence,
    * absent when `watermarkDelay <= gap`).
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
      // local so the task closure stays self-contained (no object capture).
      // getTime alone truncates to ms — the sub-ms fraction lives in nanos.
      def tsMicros(t: java.sql.Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      def microsTs(us: Long): java.sql.Timestamp = {
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      }
      val gapUs = gapMinutes * 60L * 1000000L
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        val s = state.get
        out += Session(userId, microsTs(s.start), microsTs(s.end), s.n, s.total)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(e => tsMicros(e.ts))
        var cur = state.getOption
        sorted.foreach { e =>
          val t = tsMicros(e.ts)
          cur match {
            case Some(s) if t < s.start - gapUs =>
              // a late event more than a gap BEFORE the open session's
              // start: batch, seeing full time order, closes it as its
              // own session before this one began — emit it closed now
              // (same arm as assembleConversations; without it the
              // within-gap merge below is trivially true for ANY
              // out-of-order t < s.end and the event is silently counted
              // into a session that started after it)
              out += Session(userId, microsTs(t), microsTs(t), 1, e.value)
            case Some(s) if t - s.end <= gapUs =>
              // a late-but-within-watermark event can precede the current
              // start (by at most the gap, per the case above) —
              // session_start tracks the true minimum, like batch
              cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                s.n + 1, s.total + e.value))
            case Some(s) =>
              out += Session(userId, microsTs(s.start), microsTs(s.end), s.n, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // GroupState timeouts are millisecond-granular: round UP so the
          // timer never fires before the true µs gap boundary
          state.setTimeoutTimestamp(Math.floorDiv(s.end + gapUs + 999L, 1000L))
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }

  final case class Conversation(user_id: Long, conv_start: java.sql.Timestamp, conv_end: java.sql.Timestamp, n_turns: Int, transcript: String)
  final case class ConvState(start: Long, end: Long, ts: Seq[Long], seq: Seq[Long], turns: Seq[String])

  /** Streaming conversation assembly — the streaming twin of
    * [[graft.operators.Conversations.assemble]]: each user's live event
    * stream splits at inactivity gaps, and a CLOSED conversation emits
    * one record whose transcript serializes the turns in event-time
    * order. Same state machine as [[sessionize]] (event-time timeout at
    * watermark + gap), but state carries the conversation's turns —
    * O(conversation length) per key, bounded by the gap rule, NOT by
    * stream history (the output intrinsically carries the turns; no
    * assembly operator can hold less). Turns accumulate by O(1) prepend
    * and sort by (timestamp, event_id) at emit — the batch operator's
    * exact order — so late-but-within-watermark arrivals (which also
    * LOWER conv_start when they precede it by at most the gap) and
    * same-timestamp ties serialize identically to
    * [[graft.operators.Conversations]], independent of arrival order.
    * A late turn MORE than a gap before the open conversation's start
    * emits as its own closed conversation (batch parity for a lone
    * turn; several such turns clustered within a gap of each other but
    * arriving after the conversation opened each emit singly where
    * batch would merge them — the one documented divergence, bounded
    * by the watermark and absent when `watermarkDelay <= gap`).
    */
  def assembleConversations(
      spark: SparkSession,
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours",
      sep: String = " > "
  ): Dataset[Conversation] = {
    import spark.implicits._

    def updateState(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[ConvState]
    ): Iterator[Conversation] = {
      def tsMicros(t: java.sql.Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      def microsTs(us: Long): java.sql.Timestamp = {
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      }
      def close(s: ConvState): Conversation = {
        val ordered = s.ts.lazyZip(s.seq).lazyZip(s.turns).toSeq
          .sortBy { case (t, q, _) => (t, q) }.map(_._3)
        Conversation(userId, microsTs(s.start), microsTs(s.end),
          s.ts.length, ordered.mkString(sep))
      }
      val gapUs = gapMinutes * 60L * 1000000L
      val out = scala.collection.mutable.ArrayBuffer.empty[Conversation]
      if (state.hasTimedOut) {
        out += close(state.get)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
        var cur = state.getOption
        sorted.foreach { e =>
          val t = tsMicros(e.ts)
          cur match {
            case Some(s) if t < s.start - gapUs =>
              // a late turn more than a gap BEFORE the open conversation's
              // start: batch, seeing full time order, would have closed it
              // as its own conversation before this one began — emit it
              // closed now (it cannot merge with anything later: every
              // in-order successor is past s.start, and anything still
              // later-arriving near t is itself bounded by the watermark)
              out += close(ConvState(t, t, Seq(t), Seq(e.event_id), Seq(e.event_type)))
            case Some(s) if t - s.end <= gapUs =>
              // a late-but-within-watermark turn can precede the current
              // start (by at most the gap, per the case above) —
              // conv_start tracks the true minimum, like batch
              cur = Some(ConvState(math.min(s.start, t), math.max(s.end, t),
                t +: s.ts, e.event_id +: s.seq, e.event_type +: s.turns))
            case Some(s) =>
              out += close(s)
              cur = Some(ConvState(t, t, Seq(t), Seq(e.event_id), Seq(e.event_type)))
            case None =>
              cur = Some(ConvState(t, t, Seq(t), Seq(e.event_id), Seq(e.event_type)))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(Math.floorDiv(s.end + gapUs + 999L, 1000L))
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
