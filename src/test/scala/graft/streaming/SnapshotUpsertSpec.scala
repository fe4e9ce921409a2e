package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class SnapshotUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("each batch commits a new version; latest reflects all batches; old versions persist") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("snap-upsert").toString
    val q = SnapshotUpsert.maintain(
      in.toDF().toDF("k", "v", "version"), Seq("k"), "version", dir,
      trigger = Trigger.ProcessingTime(0))
    in.addData((1L, "a", 1L), (2L, "b", 1L))
    q.processAllAvailable()
    in.addData((1L, "a2", 2L), (3L, "c", 2L))
    q.processAllAvailable()
    q.stop()

    assert(SnapshotUpsert.latestVersion(dir) == 2)
    val latest = SnapshotUpsert.read(spark, dir)
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(latest == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // time travel: version 1 still shows the pre-update state
    val v1 = SnapshotUpsert.read(spark, dir, version = 1)
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(v1 == Map(1L -> "a", 2L -> "b"))
  }

  test("within-batch version conflicts resolve to the highest version") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("snap-upsert2").toString
    val q = SnapshotUpsert.maintain(
      in.toDF().toDF("k", "v", "version"), Seq("k"), "version", dir,
      trigger = Trigger.ProcessingTime(0))
    in.addData((1L, "old", 5L), (1L, "new", 9L), (1L, "mid", 7L))
    q.processAllAvailable()
    q.stop()
    val latest = SnapshotUpsert.read(spark, dir)
      .select($"k", $"v", $"version").as[(Long, String, Long)].collect().toSeq
    assert(latest == Seq((1L, "new", 9L)))
  }

  test("a late lower-version batch cannot overwrite newer rows or resurrect tombstones") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, Boolean)]
    val dir = java.nio.file.Files.createTempDirectory("snap-upsert3").toString
    val q = SnapshotUpsert.maintain(
      in.toDF().toDF("k", "v", "version", "deleted"), Seq("k"), "version", dir,
      trigger = Trigger.ProcessingTime(0))
    // batch 1: k=1 updated at v5, k=2 deleted at v7
    in.addData((1L, "a-v5", 5L, false), (2L, "gone", 7L, true))
    q.processAllAvailable()
    // batch 2 arrives LATE with lower versions: must change nothing for
    // k=1 and k=2, only insert k=3
    in.addData((1L, "a-v3", 3L, false), (2L, "back?", 4L, false), (3L, "c", 1L, false))
    q.processAllAvailable()
    q.stop()
    val latest = SnapshotUpsert.read(spark, dir, deleteCol = Some("deleted"))
      .select($"k", $"v", $"version").as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(latest == Seq((1L, "a-v5", 5L), (3L, "c", 1L)))
    // the tombstone itself still lives in the raw snapshot (read() filtered it)
    val raw = SnapshotUpsert.read(spark, dir)
      .where($"k" === 2L).select($"v", $"version", $"deleted")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(raw == Seq(("gone", 7L, true)))
  }

  test("a crashed half-written version is invisible to readers and cleaned by the next batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("snap-upsert6").toString
    val q = SnapshotUpsert.maintain(
      in.toDF().toDF("k", "v", "version"), Seq("k"), "version", dir,
      trigger = Trigger.ProcessingTime(0))
    in.addData((1L, "a", 1L))
    q.processAllAvailable()
    // simulate a crash mid-write: a tmp dir with partial files exists but
    // was never renamed into the chain
    val debris = new java.io.File(dir, ".v-tmp-crashed")
    assert(debris.mkdir())
    assert(new java.io.File(debris, "part-00000.parquet").createNewFile())
    assert(SnapshotUpsert.latestVersion(dir) == 1, "debris must not win latestVersion")
    in.addData((2L, "b", 2L))
    q.processAllAvailable()
    q.stop()
    assert(!debris.exists(), "the next batch must sweep crash debris")
    val latest = SnapshotUpsert.read(spark, dir)
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(latest == Map(1L -> "a", 2L -> "b"))
  }

  test("vacuum bounds the version chain and compacts the latest, preserving its rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("snap-upsert5").toString
    val q = SnapshotUpsert.maintain(
      in.toDF().toDF("k", "v", "version"), Seq("k"), "version", dir,
      trigger = Trigger.ProcessingTime(0), targetRecordsPerFile = 5L)
    // a long replay: 6 micro-batches, 20 keys churning
    (1 to 6).foreach { b =>
      in.addData((1L to 20L).map(k => (k, s"b$b-k$k", b.toLong)): _*)
      q.processAllAvailable()
    }
    q.stop()
    val latest = SnapshotUpsert.latestVersion(dir)
    val preVacuum = SnapshotUpsert.read(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    val (deletedVersions, before, after) =
      SnapshotUpsert.vacuum(spark, dir, keepVersions = 2, targetRecordsPerFile = 20L, sortBy = Seq("k"))
    // v0 (seed) + 6 batch versions, keep 2 -> 5 deleted
    assert(deletedVersions == 5, s"expected 5 versions deleted, got $deletedVersions")
    val remaining = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName).sorted.toSeq
    assert(remaining == Seq(s"v${latest - 1}", s"v$latest"))
    // 20 rows at write-target 5 -> 4 files; compacted at 20 -> 1
    assert(before == 4 && after == 1, s"expected 4 -> 1 files, got $before -> $after")
    assert(SnapshotUpsert.read(spark, dir)
      .as[(Long, String, Long)].collect().toSet == preVacuum)
  }

  test("snapshot versions are written as ceil(rows/target) files, not one") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("snap-upsert4").toString
    val q = SnapshotUpsert.maintain(
      in.toDF().toDF("k", "v", "version"), Seq("k"), "version", dir,
      trigger = Trigger.ProcessingTime(0), targetRecordsPerFile = 10L)
    in.addData((1L to 95L).map(i => (i, s"v$i", 1L)): _*)
    q.processAllAvailable()
    q.stop()
    val vDir = new java.io.File(dir, s"v${SnapshotUpsert.latestVersion(dir)}")
    val files = Option(vDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files == 10, s"95 rows at target 10 should write 10 files, got $files")
    assert(SnapshotUpsert.read(spark, dir).count() == 95)
  }
}
