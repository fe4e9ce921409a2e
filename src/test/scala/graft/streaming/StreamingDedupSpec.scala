package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val base = "the quick brown fox jumps over the lazy dog again and again, " * 4

  test("incremental dedup finds duplicates across batches and within a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val work = java.nio.file.Files.createTempDirectory("sdedup-spec").toString
    val q = StreamingDedup.incrementalNearDuplicates(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", work,
      threshold = 0.9, numHashes = 120, bands = 20,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // batch 1: doc 1 and its exact copy doc 2 (within-batch pair), doc 3 unrelated
    in.addData((1L, base), (2L, base), (3L, "completely different text about spark partitions " * 5))
    q.processAllAvailable()
    // batch 2: doc 10 duplicates doc 1/2 from the INDEX (cross-batch), doc 11 unrelated
    in.addData((10L, base + "tail."), (11L, "yet another unrelated document body " * 6))
    q.processAllAvailable()
    q.stop()
    val pairs = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"within-batch pair missing: $pairs")
    assert(pairs.contains((1L, 10L)) && pairs.contains((2L, 10L)), s"cross-batch pairs missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 11L || p._2 == 11L),
      s"false positives: $pairs")
  }

  test("incremental pairs equal the batch operator's pairs on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val work = java.nio.file.Files.createTempDirectory("sdedup-spec2").toString
    val q = StreamingDedup.incrementalNearDuplicates(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", work,
      threshold = 0.9, numHashes = 120, bands = 20,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    docs.grouped((docs.length / 4).max(1)).foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.Dedup
      .nearDuplicates(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.9, numHashes = 120, bands = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
  }
}
