package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Observation, SparkSession}

/** Dev probe (r19): does a batch `Observation` yield its metrics when the
  * consuming action is `localCheckpoint()` / `checkpoint()` (the actions
  * the connected-components loop already pays for)? If yes, the per-round
  * convergence count can ride the checkpoint job instead of a separate
  * count() job.
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val df = (1L to 1000L).toDF("id")
    val obs = Observation("probe")
    val observed = df
      .groupBy((col("id") % 10).as("k")).agg(sum(col("id")).as("s"))
      .observe(obs, sum(col("s")).cast("decimal(38,0)").as("total"), count(lit(1)).as("n"))
    def getWithTimeout(o: Observation, ms: Long): Option[Map[String, Any]] = {
      @volatile var res: Option[Map[String, Any]] = None
      val t = new Thread(() => res = Some(o.get))
      t.setDaemon(true); t.start(); t.join(ms)
      res
    }
    val t0 = System.nanoTime()
    val ck = observed.localCheckpoint()
    val got = getWithTimeout(obs, 10000)
    println(f"localCheckpoint: metrics=$got after ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    println(s"checkpointed rows=${ck.count()}")

    // second observation through an eager checkpoint() to a dir
    spark.sparkContext.setCheckpointDir(java.nio.file.Files.createTempDirectory("obs-ck").toString)
    val obs2 = Observation("probe2")
    val observed2 = df.select((col("id") * 2).as("v")).observe(obs2, sum(col("v")).as("t2"))
    observed2.checkpoint()
    println(s"checkpoint(): metrics=${getWithTimeout(obs2, 10000)}")
    spark.stop()
  }
}
