package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of (point-in-time) join — the classic training-pipeline primitive
  * Spark has no native operator for (pandas `merge_asof`, Flink temporal
  * join, DuckDB `ASOF JOIN` semantics): for every left row, attach the
  * single right row with the LARGEST right timestamp <= the left
  * timestamp, per key. Left-outer: unmatched left rows keep NULLs.
  *
  * Implementation is the scalable union-tag formulation rather than a
  * range join: tag both inputs, union them, and take a running
  * `last(right_payload, ignoreNulls)` over a window partitioned by key
  * and ordered by (timestamp, side) — right rows sort BEFORE left rows
  * at equal timestamps, making the match inclusive. ONE hash shuffle on
  * the key (plus the per-partition sort Spark's window needs), no join
  * fanout, no per-row loops; at 100 TB this is a single exchange of
  * left+right, which is the lower bound for co-locating them.
  *
  * Timestamps must be NUMERIC columns (e.g. epoch micros) so tolerance
  * arithmetic is exact; convert timestamp types with `unix_micros`
  * first.
  */
object AsOf {

  /** Backward as-of join (match at-or-before).
    *
    * @param keyCols         equi-join key columns, present on both sides
    * @param leftTsCol       numeric event-time column on `left`
    * @param rightTsCol      numeric event-time column on `right`
    * @param tolerance       max allowed (leftTs - rightTs); matches
    *                        further in the past become NULL (no match)
    * @param rightPrefix     prefix for right-side output columns
    *
    * Output: all left columns, then every non-key right column as
    * `rightPrefix + name`. If several right rows share (key, ts) the
    * surviving match among them is unspecified — dedupe first.
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      tolerance: Option[Long] = None,
      rightPrefix: String = "asof_"
  ): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val leftPayloadCols = left.columns.filterNot(keyCols.contains).toSeq
    val rightPayloadCols = right.columns.filterNot(keyCols.contains).toSeq
    require(rightPayloadCols.contains(rightTsCol), s"right ts col '$rightTsCol' must not be a key")

    val lStruct = struct(leftPayloadCols.map(col): _*)
    val rStruct = struct(rightPayloadCols.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val lU = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).cast("long").as("__ts"),
        lit(1).as("__side"),
        lStruct.as("__lpay"),
        lit(null).cast(rType).as("__rpay")): _*)
    val rU = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).cast("long").as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lType).as("__lpay"),
        rStruct.as("__rpay")): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = lU.unionByName(rU)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val matched = tolerance.fold(matchedRaw.withColumn("__m", col("__match"))) { tol =>
      matchedRaw.withColumn(
        "__m",
        when(col("__ts") - col("__match").getField(rightTsCol) <= tol, col("__match")))
    }

    matched.select(
      keyCols.map(col) ++
        leftPayloadCols.map(c => col("__lpay").getField(c).as(c)) ++
        rightPayloadCols.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  /** Forward as-of join (match at-or-after): mirror of [[joinBackward]]
    * — first right row with rightTs >= leftTs, within `tolerance`.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      tolerance: Option[Long] = None,
      rightPrefix: String = "asof_"
  ): DataFrame = {
    // negate the time axis and reuse the backward machinery
    val negL = left.withColumn("__negts", -col(leftTsCol).cast("long"))
    val negR = right.withColumn("__negts", -col(rightTsCol).cast("long"))
    val joined = joinBackward(
      negL, negR.drop(rightTsCol).withColumnRenamed("__negts", "__rnegts")
        .withColumn("__rts_orig", -col("__rnegts")),
      keyCols, "__negts", "__rnegts", tolerance, rightPrefix)
    joined
      .withColumnRenamed(rightPrefix + "__rts_orig", rightPrefix + rightTsCol)
      .drop("__negts", rightPrefix + "__rnegts")
  }
}
