package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation helpers: two-phase (salted) aggregation for heavy
  * keys. A straight `groupBy(k)` sends every row of a hot key to one
  * reducer; salting fans the hot key across `saltBuckets` partial
  * groups, then merges partials — turning a single straggler task into
  * `saltBuckets` parallel ones. Use for algebraic aggregates
  * (count/sum/min/max); AQE's skew-join handling covers the join side.
  */
object Skew {

  /** Two-phase salted aggregation: `aggs` maps output column name →
    * (partial aggregate over raw rows, merge aggregate over partials).
    * Example: count = (count(lit(1)), sum), sum(x) = (sum(x), sum),
    * max(x) = (max(x), max).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int
  )(aggs: (String, (Column, Seq[Column] => Column))*): DataFrame = {
    require(saltBuckets >= 1)
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partialCols = aggs.map { case (name, (partial, _)) => partial.as(s"__p_$name") }
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.map { case (name, (_, merge)) => merge(Seq(col(s"__p_$name"))).as(name) }
    partial
      .groupBy(keys.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** Salted distinct-ish count of rows per key (exact). */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      "cnt" -> (count(lit(1)), (cs: Seq[Column]) => sum(cs.head))
    )

  /** Salted equi-join for skewed keys where BOTH sides are too large to
    * broadcast: a straight shuffle join sends every row of a hot key to
    * one reducer task. Each `left` row gets a salt in [0, saltBuckets);
    * `right` is replicated once per salt value; the join runs on
    * (keys..., salt) so a hot key's rows spread across `saltBuckets`
    * reducers. Results are identical to the unsalted join for any salt
    * assignment (every left row still meets the full right match set).
    *
    * Shuffle volume: |left| + saltBuckets × |right| — size saltBuckets
    * to the straggler ratio, not the cluster (8-32 is typical). AQE's
    * skew-join split handles moderate skew on its own; this is the
    * explicit path for extreme single-key skew (the Zipf head of a
    * web corpus) where one key exceeds a whole executor.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16,
      joinType: String = "inner"
  ): DataFrame = {
    require(saltBuckets >= 1)
    require(joinType == "inner" || joinType == "left_outer" || joinType == "left",
      s"salted join supports inner/left joins (right rows are replicated), got $joinType")
    // deterministic-enough spread: hash the whole left row's key columns
    // plus a per-partition counter; correctness never depends on it
    val salted = left.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
