package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev probe (r18 optimization round): per-JOB wall-clock breakdown of a
  * registry gate, in the exact session shape graft.Bench uses. For a
  * gate that runs many driver-sequenced Spark jobs (streaming dedup
  * batches, iterative connected components, compactions), the bench
  * number alone cannot say whether time goes to task work or to the
  * driver choreography between jobs — this prints one line per job
  * (start offset, duration, description/callsite) plus the total gap
  * time where NO job was running (driver planning, commit-log IO,
  * GC, file listing).
  *
  * Usage: runMain graft.tools.JobBreakdownProbe <gate>[,gate2,...] [sfDir]
  * Env: SPARK_GRAFT_CPUS (default 32) — match the bench.
  */
object JobBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val gates = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.warmFixtures(spark, dir): Unit

    final case class Job(id: Int, start: Long, var end: Long, desc: String)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(si =>
            s"${si.name} [${e.stageInfos.map(_.numTasks).sum} tasks/${e.stageInfos.size} stages]"))
          .getOrElse("?")
        jobs.update(e.jobId, Job(e.jobId, e.time, -1L, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }

    gates.foreach { gate =>
      // untimed warmup (JIT/codegen), like the bench
      try {
        val w = graft.SparkEntry.queries(gate)(spark, dir)
        w.queryExecution.toRdd.count(): Unit
      } catch { case e: Throwable => println(s"[$gate] warmup failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
      System.gc()

      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(gate)(spark, dir)
      df.queryExecution.toRdd.count(): Unit
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()

      val js = jobs.synchronized(jobs.values.toVector.sortBy(_.start))
      val base = js.headOption.map(_.start).getOrElse(0L)
      println(f"%n=== $gate: total ${total}%.2fs, ${js.size} jobs ===")
      var covered = 0L
      var cursor = 0L
      js.foreach { j =>
        val s = j.start - base
        val e = (if (j.end < 0) j.start else j.end) - base
        covered += math.max(0L, e - math.max(s, cursor))
        cursor = math.max(cursor, e)
        println(f"  job ${j.id}%4d  +${s / 1000.0}%7.2fs  ${(e - s) / 1000.0}%6.2fs  ${j.desc.take(110)}")
      }
      val span = cursor / 1000.0
      println(f"  [job-covered ${covered / 1000.0}%.2fs of span $span%.2fs; " +
        f"gaps ${span - covered / 1000.0}%.2fs; outside-jobs ${total - span}%.2fs]")
    }
    spark.stop()
  }
}
