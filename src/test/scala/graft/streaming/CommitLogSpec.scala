package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CommitLogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(dir: String): Set[(Long, String)] =
    CommitLog.read(spark, dir).as[(Long, String)].collect().toSet

  test("append/read round-trip; empty table reads empty with the recorded schema") {
    val dir = java.nio.file.Files.createTempDirectory("clog1").toString
    CommitLog.init(dir, Seq((0L, "")).toDF("k", "v").schema)
    assert(CommitLog.read(spark, dir).isEmpty)
    assert(CommitLog.read(spark, dir).columns.toSeq == Seq("k", "v"))
    assert(CommitLog.append(Seq((1L, "a")).toDF("k", "v"), dir, batchId = 0L))
    assert(CommitLog.append(Seq((2L, "b")).toDF("k", "v"), dir, batchId = 1L))
    assert(rows(dir) == Set((1L, "a"), (2L, "b")))
  }

  test("a replayed batchId is skipped: append is exactly-once per batch") {
    val dir = java.nio.file.Files.createTempDirectory("clog2").toString
    assert(CommitLog.append(Seq((1L, "a")).toDF("k", "v"), dir, batchId = 7L))
    // crash-recovery replays the same micro-batch: nothing may duplicate
    assert(!CommitLog.append(Seq((1L, "a")).toDF("k", "v"), dir, batchId = 7L))
    assert(CommitLog.read(spark, dir).count() == 1)
    assert(CommitLog.committedBatchIds(dir) == Set(7L))
  }

  test("data files without a published manifest are invisible (crash window)") {
    val dir = java.nio.file.Files.createTempDirectory("clog3").toString
    assert(CommitLog.append(Seq((1L, "a")).toDF("k", "v"), dir, batchId = 0L))
    // simulate a crash between the data write and the manifest publish:
    // files land under data/ but no commit names them
    Seq((99L, "orphan")).toDF("k", "v").write.parquet(s"$dir/data/orphan-batch")
    assert(rows(dir) == Set((1L, "a")), "unpublished files must never be read")
  }

  test("sink: a stream lands exactly-once and survives checkpoint restart") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("clog-sink").toString
    val src = java.nio.file.Files.createTempDirectory("clog-src").toString
    val ckpt = s"$dir-ckpt"
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    a.write.mode("append").parquet(src)
    def stream() = spark.readStream.schema(a.schema).parquet(src)
    val q1 = CommitLog.sink(stream(), dir, Trigger.AvailableNow(), Some(ckpt))
    q1.awaitTermination()
    Seq((3L, "c")).toDF("k", "v").write.mode("append").parquet(src)
    // restart from the same checkpoint: only the new file lands
    val q2 = CommitLog.sink(stream(), dir, Trigger.AvailableNow(), Some(ckpt))
    q2.awaitTermination()
    val got = rows(dir).toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")), s"got $got")
  }

  test("compact publishes a replace commit: rows preserved, files bounded, appends continue") {
    val dir = java.nio.file.Files.createTempDirectory("clog4").toString
    (0 until 6).foreach { b =>
      assert(CommitLog.append(Seq((b.toLong, s"v$b")).toDF("k", "v"), dir, b.toLong))
    }
    val pre = rows(dir)
    val (before, after) = CommitLog.compact(spark, dir, targetRecordsPerFile = 100L)
    assert(before >= 6 && after == 1, s"expected >=6 -> 1 files, got $before -> $after")
    assert(rows(dir) == pre)
    // superseded data directories were vacuumed after the publish
    val dataDirs = Option(new java.io.File(s"$dir/data").listFiles()).get.count(_.isDirectory)
    assert(dataDirs == 1, s"expected 1 live data dir after compaction, got $dataDirs")
    // the log keeps accepting appends after a replace, and replay-skip
    // still sees pre-compaction batch ids
    assert(!CommitLog.append(Seq((0L, "dup")).toDF("k", "v"), dir, batchId = 0L))
    assert(CommitLog.append(Seq((10L, "post")).toDF("k", "v"), dir, batchId = 10L))
    assert(rows(dir) == pre + ((10L, "post")))
  }
}
