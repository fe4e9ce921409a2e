package graft.tools

import graft.operators.Retrieval
import graft.streaming.CommitLog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe for the tiered inverted-index maintenance (VERDICT r17 #2):
  * measures that re-compaction cost tracks the DELTA, not the posting
  * table — the evidence row the dedup indexes got in r17
  * (PRUNE_PROBE_r17.json) applied to [[Retrieval.compactIndex]].
  *
  * Protocol per corpus size N:
  *   1. build the index over N synthetic unique docs, then one MAJOR
  *      compaction (the base tier);
  *   2. R rounds of appendToIndex(delta docs) + compactIndex — each must
  *      run MINOR; report wall seconds, delta MB and base MB;
  *   3. one forced MAJOR (incremental = false); report seconds and
  *      index MB;
  *   4. a one-term indexSearch before and after, with files
  *      selected/total — the probe-only-touched-buckets contract must
  *      survive the layout migration.
  *
  * Output: one JSON line per measurement on stdout.
  *
  * Usage: runMain graft.tools.RetrievalMaintenanceProbe <workRoot>
  *          [corpusDocs=200000,800000] [deltaDocs=2000] [reps=2]
  *          [numBuckets=64]
  */
object RetrievalMaintenanceProbe {
  def main(args: Array[String]): Unit = {
    val workRoot = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-rmprobe").toString)
    def argOf(name: String, dflt: String): String =
      args.drop(1).collectFirst { case a if a.startsWith(s"$name=") => a.drop(name.length + 1) }
        .getOrElse(dflt)
    val corpusSizes = argOf("corpusDocs", "200000,800000").split(",").map(_.trim.toLong)
    val deltaDocs = argOf("deltaDocs", "2000").toLong
    val reps = argOf("reps", "2").toInt
    val numBuckets = argOf("numBuckets", "64").toInt

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic docs: 40 words of 8 hex chars keyed on the doc id —
    // a realistic vocabulary growth curve (every doc contributes mostly
    // corpus-unique terms, the worst case for posting-table size)
    def docs(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"), concat_ws(" ",
        transform(sequence(lit(0), lit(39)),
          w => substring(md5(concat(col("id"), lit("_"), w)), 1, 8))).as("text"))

    def mb(dir: String, files: Seq[String]): Long =
      files.map(f => new java.io.File(s"$dir/$f").length).sum / (1024 * 1024)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    def searchProbe(dir: String, phase: String, n: Long): Unit = {
      val (sec, _) = timed {
        Retrieval.indexSearch(spark, dir, Seq("aaaa"), topK = 10).collect(): Unit
      }
      val all = CommitLog.currentFiles(dir)
      val probed = Retrieval.indexSearch(spark, dir, Seq("aaaa"), topK = 10)
        .inputFiles.length
      println(s"""{"probe":"retrieval","phase":"search_$phase","corpusDocs":$n,""" +
        s""""sec":${f"$sec%.3f"},"filesSelected":$probed,"filesTotal":${all.size}}""")
    }

    for (n <- corpusSizes) {
      val dir = s"$workRoot/ridx$n"
      val (buildSec, _) = timed {
        Retrieval.buildIndex(docs(0, n), "doc_id", "text", dir, numBuckets = numBuckets)
      }
      println(s"""{"probe":"retrieval","phase":"build","corpusDocs":$n,"sec":${f"$buildSec%.3f"}}""")
      val (majorSec0, major0) = timed(Retrieval.compactIndex(spark, dir))
      require(major0.mode == "major", s"first compaction must be major: $major0")
      println(s"""{"probe":"retrieval","phase":"compact_major_initial","corpusDocs":$n,""" +
        s""""sec":${f"$majorSec0%.3f"},"indexMB":${major0.baseBytes / (1024 * 1024) +
          major0.deltaBytes / (1024 * 1024)},"layout":"${major0.layout}"}""")
      searchProbe(dir, "base", n)

      var next = n
      for (r <- 1 to reps) {
        Retrieval.appendToIndex(docs(next, next + deltaDocs), "doc_id", "text", dir)
        next += deltaDocs
        val deltaMB = {
          val all = CommitLog.currentFiles(dir)
          mb(dir, all.filterNot(_.contains("__p")))
        }
        val baseMB = mb(dir, CommitLog.currentFiles(dir).filter(_.contains("__p")))
        val (sec, res) = timed(Retrieval.compactIndex(spark, dir))
        require(res.mode == "minor", s"round $r expected minor: $res")
        println(s"""{"probe":"retrieval","phase":"compact_minor","corpusDocs":$n,""" +
          s""""round":$r,"deltaDocs":$deltaDocs,"sec":${f"$sec%.3f"},""" +
          s""""deltaMB":$deltaMB,"baseMB":$baseMB,"tiers":${res.tiers},"layout":"${res.layout}"}""")
      }
      searchProbe(dir, "tiered", n)

      val indexMB = mb(dir, CommitLog.currentFiles(dir))
      val (sec, res) = timed(Retrieval.compactIndex(spark, dir, incremental = false))
      require(res.mode == "major", s"forced major expected: $res")
      println(s"""{"probe":"retrieval","phase":"compact_major","corpusDocs":$n,""" +
        s""""sec":${f"$sec%.3f"},"indexMB":$indexMB,"layout":"${res.layout}"}""")
      searchProbe(dir, "major", n)
    }
    spark.stop()
  }
}
