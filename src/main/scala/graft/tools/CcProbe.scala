package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe (r19): diagnose the connected-components loop — stats of a
  * checkpointed frame (what Spread.scaledPartitions sees), per-round job
  * counts, convergence behavior.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val raw = (1L to 1000L).map(i => (i, i % 97)).toDF("x", "g")
    val pairs = raw.select(col("x").as("id1"), (col("x") - col("g")).as("id2"))
      .where(col("id1") =!= col("id2"))
    val p0 = pairs.localCheckpoint()
    println(s"p0 stats.sizeInBytes = ${p0.queryExecution.optimizedPlan.stats.sizeInBytes}")
    println(s"p0 partitions = ${p0.rdd.getNumPartitions}")
    println(s"scaledPartitions(p0) = ${graft.operators.Spread.scaledPartitions(spark, p0)}")

    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val cc = graft.operators.Dedup.connectedComponents(pairs, "id1", "id2")
    val n = cc.count()
    spark.sparkContext.removeSparkListener(listener)
    println(f"CC: $n labels, $jobs jobs, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val comps = cc.select(col("component")).distinct().count()
    println(s"components = $comps (expect 11: one star per multiple of 97)")
    spark.stop()
  }
}
