package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output side of a training-data pipeline: layout-controlled parquet.
  *
  * At 100 TB the write layout decides every downstream read: partition
  * directories give coarse pruning (`WHERE lang = 'en'` skips whole
  * directories), in-file sort gives min/max row-group pruning on the
  * sort key, and one shuffle before the write bounds file counts
  * (`files = partitions x distinct partition values` without it).
  */
object Sink {

  /** Write `df` as partitioned parquet: one hash shuffle on the
    * partition columns (so each partition value is written by as few
    * tasks as possible — no small-file explosion), sorted within tasks
    * by `sortBy` (row-group min/max pruning on those columns), capped
    * at `maxRecordsPerFile` (bounds file sizes under data skew: a hot
    * partition value rolls into multiple files instead of one huge one).
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String],
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L
  ): Unit = {
    require(partitionBy.nonEmpty, "partitionBy must name at least one column")
    val shuffled = df.repartition(partitionBy.map(col): _*)
    val sorted =
      if (sortBy.isEmpty) shuffled
      else shuffled.sortWithinPartitions((partitionBy ++ sortBy).map(col): _*)
    sorted.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** Read back a [[writePartitioned]] dataset with the partition
    * columns restored to the requested types (directory-encoded values
    * come back as inferred types; a pipeline wants the declared ones).
    */
  def readPartitioned(spark: SparkSession, path: String, partitionTypes: (String, String)*): DataFrame =
    partitionTypes.foldLeft(spark.read.parquet(path)) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t))
    }
}
