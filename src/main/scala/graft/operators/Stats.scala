package graft.operators

import graft.functions.KmvDistinct

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Table-statistics collection — the ANALYZE step a cost-based planner
  * and a data-quality dashboard both need: per-column row/null counts,
  * min/max, and distinct-count (NDV) in ONE scan of the table.
  *
  * NDV uses the mergeable KMV sketch, so the whole collection is a
  * single map-side-combined aggregation: every partial carries counts,
  * two extrema, and ≤k hash values per column — never the column's
  * value set. Below k distinct values the NDV is exact (the gate's
  * regime); above it the estimate carries the usual ~1/sqrt(k-2)
  * relative error, which is what ANALYZE tolerates at 100 TB anyway.
  * The single collected row is O(columns), not O(data).
  */
object Stats {

  private val outSchema = StructType(Seq(
    StructField("column_name", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("ndv", LongType, nullable = false),
    StructField("min_val", StringType, nullable = true),
    StructField("max_val", StringType, nullable = true)))

  /** (column_name, n_rows, n_nulls, ndv, min_val, max_val) per requested
    * column; min/max rendered as strings so heterogeneous column types
    * share one result shape (the ANALYZE convention).
    */
  def collect(df: DataFrame, cols: Seq[String], ndvK: Int = 4096): DataFrame = {
    require(cols.nonEmpty, "cols must name at least one column")
    val kmv = udaf(new KmvDistinct(ndvK))
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        kmv(xxhash64(col(c))).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = cols.zipWithIndex.map { case (c, i) =>
      val base = i * 5
      val nNulls = row.getLong(base + 1)
      // xxhash64 of a NULL input is the bare seed, so any null rows add
      // exactly ONE spurious distinct hash — subtract it for ANSI NDV
      // (count(DISTINCT c) ignores NULLs)
      val ndv = row.getLong(base + 2) - (if (nNulls > 0) 1L else 0L)
      Row(c, row.getLong(base), nNulls, ndv,
        row.getString(base + 3), row.getString(base + 4))
    }
    val spark = df.sparkSession
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), outSchema)
  }
}
