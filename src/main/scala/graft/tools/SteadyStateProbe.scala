package graft.tools

import graft.streaming.{CommitLog, StreamingDedup}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe for the steady-state streaming-dedup regime (VERDICT r15
  * "next round" #1): a LARGE accumulated compacted index + SMALL
  * trailing batches — the shape a real nightly/continuous ingest runs,
  * which the registered gate fixtures (duplication-saturated, batches
  * touching every partition) deliberately do not time.
  *
  * Protocol per index size N:
  *   1. ingest N synthetic unique docs through processBatch (catch-up
  *      chunks), 10% of each trailing batch duplicating corpus docs;
  *   2. phase "plain": R trailing batches against the UNCOMPACTED
  *      append-log layout (every batch reads the whole index);
  *   3. compactIndex(indexPartitions = P) → `__p<P>=` layouts for both
  *      the bands index (bucket-hash) and shingles log (id-hash);
  *   4. phase "compacted": R trailing batches — probe reads prune to
  *      the partitions the batch's (band, bucket) pairs hash into,
  *      verify reads prune to the partitions candidate ids hash into.
  *
  * Per batch it reports wall seconds, executor inputMetrics.bytesRead
  * (all scans: index + shingles + the batch itself), and the bands-index
  * file prune (selected/total, recomputed with the exact processBatch
  * logic). Output: one JSON line per measurement on stdout.
  *
  * Usage: runMain graft.tools.SteadyStateProbe <workRoot>
  *          [indexDocs=100000,200000,400000] [batchSizes=1,10,100]
  *          [partitions=512] [reps=3]
  */
object SteadyStateProbe {
  def main(args: Array[String]): Unit = {
    val workRoot = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ssprobe").toString)
    def argOf(name: String, dflt: String): String =
      args.drop(1).collectFirst { case a if a.startsWith(s"$name=") => a.drop(name.length + 1) }
        .getOrElse(dflt)
    val indexSizes = argOf("indexDocs", "100000,200000,400000").split(",").map(_.trim.toLong)
    val batchSizes = argOf("batchSizes", "1,10,100").split(",").map(_.trim.toInt)
    val partitions = argOf("partitions", "512").toInt
    val reps = argOf("reps", "3").toInt

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic unique doc text: 40 words of 8 hex chars keyed on a
    // text id — duplicates are other ids' texts under a fresh doc id
    def docs(ids: DataFrame): DataFrame =
      ids.select(col("id"), concat_ws(" ",
        transform(sequence(lit(0), lit(39)),
          w => substring(md5(concat(col("tid"), lit("_"), w)), 1, 8))).as("text"))

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    def measure[A](f: => A): (Double, Long) = {
      Thread.sleep(300) // drain straggler task-end events into the counter
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (sec, bytesRead.get())
    }

    for (n <- indexSizes) {
      val work = s"$workRoot/idx${n}_p$partitions"
      StreamingDedup.incrementalNearDuplicatesInit(spark, work)
      var nextId = 0L
      var batchId = 0L
      def ingest(count: Long, dupFrac: Double): DataFrame = {
        val start = nextId
        nextId += count
        val ids = spark.range(start, start + count).select(
          col("id"),
          // every ~1/dupFrac-th doc reuses an existing text id
          when(lit(dupFrac) > 0 && pmod(col("id"), lit((1 / dupFrac).toLong)) === 0
               && col("id") >= lit(count),
            pmod(col("id") * 2654435761L, lit(start.max(1L))))
            .otherwise(col("id")).cast("string").as("tid"))
        docs(ids).repartition(spark.sparkContext.defaultParallelism, col("id"))
      }
      def run(batch: DataFrame): StreamingDedup.BatchStats = {
        val st = StreamingDedup.processBatch(batch, work, 0.9, 5, 120, 20, batchId = Some(batchId))
        batchId += 1
        st
      }
      // 1. build the corpus (unique docs, catch-up chunks)
      val chunk = 100000L
      var left = n
      while (left > 0) { run(ingest(math.min(chunk, left), 0.0)); left -= math.min(chunk, left) }

      def phase(name: String): Unit =
        for (bs <- batchSizes; r <- 1 to reps) {
          val b = ingest(bs.toLong, 0.1).persist()
          b.count(): Unit // materialize outside the timed window
          var st: StreamingDedup.BatchStats = null
          val (sec, bytes) = measure { st = run(b) }
          b.unpersist(): Unit
          println(s"""{"probe":"steady","phase":"$name","indexDocs":$n,"partitions":$partitions,""" +
            s""""batch":$bs,"rep":$r,"sec":${f"$sec%.3f"},"taskBytesRead":$bytes,""" +
            s""""bandFilesSelected":${st.bandFilesSelected},"bandFilesTotal":${st.bandFilesTotal},""" +
            s""""bandMBSelected":${st.bandBytesSelected / 1000000},"bandMBTotal":${st.bandBytesTotal / 1000000},""" +
            s""""shFilesSelected":${st.shFilesSelected},"shFilesTotal":${st.shFilesTotal},""" +
            s""""shMBSelected":${st.shBytesSelected / 1000000},"shMBTotal":${st.shBytesTotal / 1000000}}""")
        }
      phase("plain")
      // shingle-log rows = docs (one per id) while bands rows = 20x docs
      // — size the target so BOTH logs cross the partitioned-layout
      // threshold at every tested index size
      val target = math.max(1000L, n / 10)
      var t0 = System.nanoTime()
      StreamingDedup.compactIndex(spark, work, targetRecordsPerFile = target,
        indexPartitions = partitions)
      println(s"""{"probe":"steady","phase":"compact","indexDocs":$n,"partitions":$partitions,""" +
        s""""sec":${f"${(System.nanoTime() - t0) / 1e9}%.3f"}}""")
      phase("compacted")
      // hybrid nightly layout: bands unpartitioned (sorted by id, sigb
      // dictionary locality kept), shingles still id-hash partitioned
      t0 = System.nanoTime()
      StreamingDedup.compactIndex(spark, work, targetRecordsPerFile = target,
        indexPartitions = partitions, bandsPartitions = 1)
      println(s"""{"probe":"steady","phase":"compact_hybrid","indexDocs":$n,"partitions":$partitions,""" +
        s""""sec":${f"${(System.nanoTime() - t0) / 1e9}%.3f"}}""")
      phase("hybrid")

      // 5. TIERED maintenance (VERDICT r16 #1): the nightly schedule —
      // ingest a 1%-of-corpus delta, re-compact. The re-compaction must
      // fold ONLY the delta (mode "minor"), so its cost tracks deltaDocs
      // while a forced full rewrite (mode "major") tracks indexDocs. Two
      // minor rounds show the per-round cost is flat; the closing major
      // is the O(index) reference point the minors are measured against.
      val deltaDocs = math.max(1000L, n / 100)
      for (round <- 1 to 2) {
        run(ingest(deltaDocs, 0.1))
        t0 = System.nanoTime()
        val det = StreamingDedup.compactIndexDetailed(spark, work,
          targetRecordsPerFile = target, indexPartitions = partitions)
        val sec = (System.nanoTime() - t0) / 1e9
        val modes = det.map { case (k, v) => s""""$k":"${v.mode}/${v.layout}"""" }.mkString(",")
        val deltaMB = det.values.map(_.deltaBytes).sum / 1000000
        val baseMB = det.values.map(_.baseBytes).sum / 1000000
        println(s"""{"probe":"steady","phase":"compact_minor","indexDocs":$n,""" +
          s""""round":$round,"deltaDocs":$deltaDocs,"sec":${f"$sec%.3f"},""" +
          s""""deltaMB":$deltaMB,"baseMB":$baseMB,"modes":{$modes}}""")
      }
      t0 = System.nanoTime()
      val maj = StreamingDedup.compactIndexDetailed(spark, work,
        targetRecordsPerFile = target, indexPartitions = partitions,
        incremental = false)
      val majSec = (System.nanoTime() - t0) / 1e9
      val majModes = maj.map { case (k, v) => s""""$k":"${v.mode}/${v.layout}"""" }.mkString(",")
      println(s"""{"probe":"steady","phase":"compact_major","indexDocs":$n,""" +
        s""""sec":${f"$majSec%.3f"},"indexMB":${maj.values.map(v => v.baseBytes + v.deltaBytes).sum / 1000000},""" +
        s""""modes":{$majModes}}""")
    }
    spark.stop()
  }
}
