package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: LSH bucket-size distribution for the doc_leakage_split
  * parameters (numHashes=120, bands=20) — diagnosing candidate-pair
  * fanout at a given scale factor.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for ((nh, bands) <- Seq((120, 20), (128, 32))) {
      val rowsPerBand = nh / bands
      val sig = docs.select(
        col("doc_id").as("__id"),
        graft.operators.Dedup.minhashSignature(col("text"), 5, nh).as("__sig"))
      val banded = sig.select(
        col("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand))))).as(Seq("__band", "__bucket")))
      val sizes = banded.groupBy("__band", "__bucket").agg(count(lit(1)).as("n"))
      val stats = sizes.agg(
        count(lit(1)).as("buckets"),
        max(col("n")).as("max_n"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs"),
        sum(when(col("n") > 1000, col("n") * (col("n") - 1) / 2).otherwise(0L)).as("pairs_oversized"),
        sum(when(col("n") > 1000, 1L).otherwise(0L)).as("oversized")).collect()(0)
      println(s"[probe] nh=$nh bands=$bands -> $stats")
    }
    spark.stop()
  }
}
