package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation assembly: turn an interleaved event/message log into
  * ordered per-conversation records — the step an SFT/dialog pipeline
  * runs to build training examples from raw logs (each user's timeline
  * splits into conversations at inactivity gaps, and each conversation's
  * turns serialize IN ORDER into one record).
  *
  * Scale shape (100 TB of logs): exactly ONE exchange. The session
  * window shuffles on the user key; the per-conversation aggregate then
  * groups by (user, conversation) — a superset of the window's hash
  * partitioning, so Spark plans it WITHOUT a second exchange (pinned by
  * ConversationsSpec). Per-conversation `collect_list` state is bounded
  * by conversation length (turns between 30-minute gaps), not by user
  * history — the window sort, which spills, carries the unbounded part.
  *
  * Determinism: turns order by (timestamp, sequence id) — a total order
  * when the id is unique — so the serialized transcript is byte-stable
  * across engines, which is what lets DuckDB replicate it exactly
  * (`string_agg(..., ORDER BY ts, id)`).
  */
object Conversations {

  /** One row per (user, conversation): conv_id (1-based per user, in
    * time order), start/end timestamps (µs), turn count, and the
    * transcript — `turnCol` values joined by `sep` in (ts, seq) order.
    * A new conversation starts where the gap from the user's previous
    * event strictly exceeds `gapMicros` (the [[Sessionize]] rule).
    */
  def assemble(
      events: DataFrame,
      userCol: String,
      tsMicrosCol: String,
      seqCol: String,
      turnCol: String,
      gapMicros: Long,
      sep: String = " > "
  ): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsMicrosCol), col(seqCol))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsMicrosCol), 1).over(byUser))
      .withColumn(
        "__new_conv",
        when(col("__prev").isNull || col(tsMicrosCol) - col("__prev") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("conv_id", sum(col("__new_conv")).over(running))
      .groupBy(col(userCol), col("conv_id"))
      .agg(
        min(col(tsMicrosCol)).as("conv_start_us"),
        max(col(tsMicrosCol)).as("conv_end_us"),
        count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              col(tsMicrosCol).as("t"), col(seqCol).as("s"), col(turnCol).as("u")))),
            x => x.getField("u")),
          sep).as("transcript"))
  }
}
