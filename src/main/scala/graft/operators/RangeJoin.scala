package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Range (interval) joins — `point ∈ [lo, hi]` — without the cartesian
  * product Spark plans for non-equi joins when neither side fits in a
  * broadcast.
  *
  * The bin trick: pick a bin width, map every point to its single bin
  * `floor(p / w)`, explode every interval to the bins it overlaps, and
  * equi-join on the bin before checking exact containment. Each
  * (point, interval) pair can meet in at most ONE bin — the bin holding
  * the point — so no post-join dedup is needed. Shuffle volume is
  * `|points| + Σ interval_len/w`, and the exact predicate only runs on
  * bin-colocated pairs. This is the published bin-bucketed range-join
  * optimization; `w` trades explode factor (long intervals) against
  * bin selectivity (choose w ≈ typical interval length).
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose `[loCol, hiCol]` (inclusive)
    * contain `ptCol`. All three columns must be numeric (e.g. epoch
    * micros). Optional `keyCols` add equi-key conjuncts (present on both
    * sides) to the bin join. Output: all point columns + all interval
    * columns (inner join).
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    def bin(c: Column): Column = floor(c.cast("double") / lit(binWidth.toDouble)).cast("long")
    val p = points.withColumn("__bin", bin(col(ptCol)))
    val iv = intervals
      // empty/inverted intervals match nothing — and sequence() would
      // throw on a descending range
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, Seq("__bin") ++ keyCols)
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
