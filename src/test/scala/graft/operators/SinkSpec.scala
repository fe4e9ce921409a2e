package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("writePartitioned lays out partition directories and round-trips exactly") {
    val out = java.nio.file.Files.createTempDirectory("sink-spec").toString
    Sink.writePartitioned(docs, out, partitionBy = Seq("lang"), sortBy = Seq("doc_id"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")), s"got ${dirs.toSeq}")
    val back = Sink.readPartitioned(spark, out, "lang" -> "string")
    assert(back.count() == docs.count())
    val orig = docs.select($"doc_id", $"lang", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val round = back.select($"doc_id", $"lang", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(round == orig)
  }

  test("files are sorted by the sortBy key within each file") {
    val out = java.nio.file.Files.createTempDirectory("sink-sorted").toString
    Sink.writePartitioned(docs, out, partitionBy = Seq("lang"), sortBy = Seq("doc_id"))
    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath).select($"doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"${f.getName} not sorted by doc_id")
    }
  }

  test("bucketed tables join without a shuffle (no Exchange above the scans)") {
    val a = docs.select($"doc_id", $"lang")
    val b = docs.select($"doc_id", $"n_chars")
    Sink.writeBucketed(a, "sinkspec_a", Seq("doc_id"), nBuckets = 4, sortCols = Seq("doc_id"))
    Sink.writeBucketed(b, "sinkspec_b", Seq("doc_id"), nBuckets = 4, sortCols = Seq("doc_id"))
    val ta = spark.table("sinkspec_a")
    val tb = spark.table("sinkspec_b")
    // merge hint: without it the 500-row side broadcasts and the bucket
    // layout is never exercised — the fact-fact SMJ is what buckets are for
    val joined = ta.join(tb.hint("merge"), "doc_id")
    assert(joined.count() == docs.count())
    def collectPlan[T](p: org.apache.spark.sql.execution.SparkPlan)(
        f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] =
      p.collect {
        case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          collectPlan(ad.executedPlan)(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          collectPlan(q.plan)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten
    val plan = joined.queryExecution.executedPlan
    val smj = collectPlan(plan) { case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a SortMergeJoin:\n$plan")
    val shuffles = collectPlan(plan) { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"bucketed SMJ must read co-located buckets with zero shuffles:\n$plan")
  }

  test("maxRecordsPerFile rolls hot partitions into multiple bounded files") {
    val out = java.nio.file.Files.createTempDirectory("sink-rolled").toString
    Sink.writePartitioned(docs, out, partitionBy = Seq("lang"), sortBy = Seq("doc_id"),
      maxRecordsPerFile = 10L)
    val counts = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => spark.read.parquet(f.getAbsolutePath).count())
    assert(counts.length > 5, "hot partitions must roll into multiple files")
    assert(counts.forall(_ <= 10L), s"every file must respect the cap, got ${counts.max}")
  }

  test("compact rewrites a fragmented dataset into right-sized sorted files, atomically") {
    val out = java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs.repartition(32).write.mode("overwrite").parquet(out)
    val before = docs.collect().map(_.toString).sorted.toSeq
    val (nBefore, nAfter) = Sink.compact(spark, out, targetRecordsPerFile = 200, sortBy = Seq("doc_id"))
    assert(nBefore == 32, s"fragmented copy should have 32 files, had $nBefore")
    assert(nAfter == 3, s"500 rows at 200/file should compact to 3 files, got $nAfter") // ceil(500/200)
    // fidelity: same rows after the swap
    val after = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // sorted rewrite: files carry disjoint doc_id ranges
    val perFile = spark.read.parquet(out)
      .groupBy(org.apache.spark.sql.functions.input_file_name().as("f"))
      .agg(org.apache.spark.sql.functions.min("doc_id").as("lo"),
        org.apache.spark.sql.functions.max("doc_id").as("hi"))
      .orderBy(col("lo")).collect()
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
      case _ =>
    }
    // no stray staging dirs survive
    assert(!new java.io.File(out + ".compact-tmp").exists())
    assert(!new java.io.File(out + ".compact-old").exists())
  }
}
