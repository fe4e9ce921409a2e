package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Dev probe (r19, VERDICT r18 #7): time the AUTO-layout MAJOR
  * compaction in isolation on a synthetic bands-shaped dataset whose fat
  * per-doc payload inflates under key-hash scattering (the regime where
  * AUTO picks the hybrid and the pre-r19 code paid a double full write).
  * Prints the compaction decision and wall time, with the sampled
  * estimate on (default) or off (`off` as 3rd arg).
  *
  * Usage: runMain graft.tools.AutoLayoutProbe <docs> <copiesPerDoc> [off]
  */
object AutoLayoutProbe {
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toInt else 100000
    val copies = if (args.length > 1) args(1).toInt else 20
    val estimateOff = args.length > 2 && args(2) == "off"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (estimateOff)
      spark.conf.set(graft.streaming.TieredCompaction.SampledAutoLayoutConf, "false")

    val dir = java.nio.file.Files.createTempDirectory("graft-autolayout").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("band", IntegerType),
      StructField("bucket", LongType), StructField("sigb", BinaryType)))
    graft.streaming.CommitLog.init(dir, schema)
    // bands shape: `copies` rows per doc share one fat pseudo-random
    // payload; sorted-by-id they dictionary-encode, scattered they don't
    val df = spark.range(docs.toLong)
      .select(col("id"),
        explode(sequence(lit(0), lit(copies - 1))).as("band"))
      .select(col("id"), col("band").cast("int").as("band"),
        xxhash64(col("id"), col("band")).as("bucket"),
        // ~96-byte payload deterministic per id
        unhex(concat((0 until 12).map(i => lpad(hex(xxhash64(col("id"), lit(i))), 16, "0")): _*))
          .as("sigb"))
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .sortWithinPartitions(col("id"))
    graft.streaming.CommitLog.appendAlways(df, dir)

    val t0 = System.nanoTime()
    val res = graft.streaming.TieredCompaction.compactKeyed(
      spark, dir, targetRecordsPerFile = 5000000L,
      partitions = graft.streaming.TieredCompaction.AutoLayout,
      keyCols = Seq("band", "bucket"), hybridSort = Seq("id"))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"AUTO major: $res, estimate=${!estimateOff}, ${sec}%.2f s")
    spark.stop()
  }
}
