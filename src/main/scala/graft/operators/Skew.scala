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
}
