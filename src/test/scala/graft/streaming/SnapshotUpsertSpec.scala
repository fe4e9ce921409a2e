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
}
