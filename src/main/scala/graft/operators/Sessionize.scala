package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: group each user's event sequence into sessions
  * separated by inactivity gaps longer than `gapMicros`.
  *
  * Classic gaps-and-islands over window functions: one shuffle on the
  * user key, then per-partition `lag` + running sum — no state store, no
  * self-join, linear in events. At 100 TB this is the shape that scales:
  * every user's timeline sorts within its partition (Spark's window sort
  * spills if a single user exceeds memory) and nothing else moves.
  *
  * The streaming variant (`EventStreams.sessionize`,
  * `flatMapGroupsWithState` + event-time timeout) serves the unbounded
  * case; this batch form is for backfills/reprocessing and is exactly
  * replicable by any SQL engine, so it carries the oracle gate.
  */
object Sessionize {

  /** One row per (user, session): start/end timestamps (µs), event count
    * and value sum. A new session starts where the gap from the previous
    * event exceeds `gapMicros` (strictly greater, matching the streaming
    * variant's `t - end <= gapMs` continuation rule).
    */
  def assign(
      df: DataFrame,
      userCol: String,
      tsMicrosCol: String,
      valueCol: String,
      gapMicros: Long
  ): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsMicrosCol))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__prev", lag(col(tsMicrosCol), 1).over(byUser))
      .withColumn(
        "__new_session",
        when(col("__prev").isNull || col(tsMicrosCol) - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_session")).over(running))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsMicrosCol)).as("session_start_us"),
        max(col(tsMicrosCol)).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }
}
