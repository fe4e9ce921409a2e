package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Failure-mode and schedule-independence properties of the shared
  * tiered maintenance (VERDICT r17 #4): minors stack tiers whose UNION
  * is the dataset, so (a) any interleaving of appends and minor/major
  * compactions must read back exactly the plain append-only log, and
  * (b) the crash window between the replace publish and the vacuum —
  * superseded data generations still on disk but unreferenced — must be
  * invisible to readers and collected by the next compaction.
  */
class TieredCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshLog(): String = {
    val dir = java.nio.file.Files.createTempDirectory("tiered-spec").toString
    import org.apache.spark.sql.types._
    CommitLog.init(dir, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    dir
  }

  private def frame(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def readSorted(dir: String): Seq[(Long, String)] =
    CommitLog.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toSeq

  private def compact(dir: String, incremental: Boolean, maxTiers: Int = 8) =
    TieredCompaction.compactKeyed(spark, dir, targetRecordsPerFile = 4L,
      partitions = 4, keyCols = Seq("k"), hybridSort = Seq("k"),
      incremental = incremental, maxTiers = maxTiers)

  test("random minor/major interleaves always equal the append-only log") {
    val batches = (0 until 6).map { b =>
      (0 until 5).map(i => (b * 100L + i, s"v$b-$i"))
    }
    val expected = batches.flatten.sortBy(identity)
    val rnd = new scala.util.Random(20260816L) // pinned: replayable
    for (trial <- 0 until 4) {
      val dir = freshLog()
      var minors = 0
      var majors = 0
      batches.zipWithIndex.foreach { case (rows, b) =>
        CommitLog.append(frame(rows), dir, b.toLong): Unit
        rnd.nextInt(3) match {
          case 0 => // no compaction this round: tiers accumulate appends
          case 1 =>
            val r = compact(dir, incremental = true,
              maxTiers = 1 + rnd.nextInt(3))
            if (r.mode == "minor") minors += 1
            if (r.mode == "major") majors += 1
          case 2 =>
            compact(dir, incremental = false): Unit
            majors += 1
        }
        assert(readSorted(dir) == batches.take(b + 1).flatten.sortBy(identity),
          s"trial $trial diverged after batch $b (minors=$minors majors=$majors)")
      }
      assert(readSorted(dir) == expected, s"trial $trial final state diverged")
    }
    // the reference schedule: all appends, ONE major
    val ref = freshLog()
    batches.zipWithIndex.foreach { case (rows, b) =>
      CommitLog.append(frame(rows), ref, b.toLong): Unit
    }
    assert(compact(ref, incremental = false).mode == "major")
    assert(readSorted(ref) == expected)
  }

  test("minor tiers stack to maxTiers, then one major folds them to a single tier") {
    val dir = freshLog()
    // 8 rows > targetRecordsPerFile, so the first major writes the
    // explicit p4 partitioned base minors can extend (a one-row base
    // would collapse to the p1 hybrid, making wantP=4 minors ineligible)
    CommitLog.append(frame((0 until 8).map(i => (i.toLong, s"base$i"))), dir, 0L): Unit
    assert(compact(dir, incremental = true).mode == "major") // first = full rewrite
    (1 to 3).foreach { b =>
      CommitLog.append(frame(Seq((b * 10L, s"d$b"))), dir, b.toLong): Unit
      val r = compact(dir, incremental = true, maxTiers = 3)
      if (b <= 2) assert(r.mode == "minor" && r.tiers == b + 1, s"batch $b: $r")
      else assert(r.mode == "major" && r.tiers == 1, s"past maxTiers must major: $r")
    }
    assert(readSorted(dir).map(_._1) ==
      ((0L until 8L) ++ Seq(10L, 20L, 30L)))
  }

  test("crash between publish and vacuum: debris is invisible and later collected") {
    val dir = freshLog()
    CommitLog.append(frame((0 until 8).map(i => (i.toLong, s"a$i"))), dir, 0L): Unit
    compact(dir, incremental = true): Unit // establish a base tier
    CommitLog.append(frame((8 until 12).map(i => (i.toLong, s"b$i"))), dir, 1L): Unit
    val expected = readSorted(dir)

    // snapshot the pre-compaction data generations, run the compaction
    // (publish + vacuum), then restore the superseded generations — the
    // exact on-disk state of a crash after commitFiles, before vacuum
    val dataDir = new java.io.File(s"$dir/data")
    def gens() = Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet
    val before = gens()
    val snap = java.nio.file.Files.createTempDirectory("tiered-snap")
    before.foreach { g =>
      copyTree(new java.io.File(s"$dir/data/$g"), snap.resolve(g).toFile)
    }
    val r = compact(dir, incremental = true)
    assert(r.mode == "minor")
    val live = CommitLog.referencedDataDirs(dir)
    (before -- live).foreach { g => // vacuumed by the compaction: restore
      copyTree(snap.resolve(g).toFile, new java.io.File(s"$dir/data/$g"))
    }
    assert((gens() -- live).nonEmpty, "fixture failed to recreate debris")

    // a reader sees exactly the committed fileset — no double-counted
    // rows from the debris generation, nothing missing
    assert(readSorted(dir) == expected, "debris leaked into a read")

    // the NEXT compaction's vacuum collects the unreferenced debris
    CommitLog.append(frame(Seq((100L, "c"))), dir, 2L): Unit
    compact(dir, incremental = true): Unit
    val after = gens()
    assert((before -- CommitLog.referencedDataDirs(dir)).forall(g => !after.contains(g)),
      s"debris survived the follow-up vacuum: ${after -- CommitLog.referencedDataDirs(dir)}")
    assert(readSorted(dir) == expected :+ (100L, "c"))
  }

  test("sampled AUTO layout decides like the measured path above the row floor (r19)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val rows = TieredCompaction.AutoSampleMinRows + 40000 // probe engages
    def bandsLike(copies: Int): (String, org.apache.spark.sql.DataFrame) = {
      val dir = java.nio.file.Files.createTempDirectory("tiered-auto").toString
      CommitLog.init(dir, StructType(Seq(
        StructField("id", LongType), StructField("band", IntegerType),
        StructField("bucket", LongType), StructField("sigb", BinaryType))))
      val df = spark.range(rows / copies)
        .select(col("id"), explode(sequence(lit(0), lit(copies - 1))).as("band"))
        .select(col("id"), col("band").cast("int").as("band"),
          xxhash64(col("id"), col("band")).as("bucket"),
          // fat per-id payload: adjacent under the id sort, scattered by
          // the (band, bucket) hash layout
          unhex(concat((0 until 12).map(i =>
            lpad(hex(xxhash64(col("id"), lit(i))), 16, "0")): _*)).as("sigb"))
        .repartition(4, col("id")).sortWithinPartitions(col("id"))
      (dir, df)
    }
    def autoCompact(dir: String) = TieredCompaction.compactKeyed(
      spark, dir, targetRecordsPerFile = 50000L,
      partitions = TieredCompaction.AutoLayout,
      keyCols = Seq("band", "bucket"), hybridSort = Seq("id"),
      autoDefault = 16)
    // duplicated fat payload: scattering kills dictionary adjacency →
    // the sampled estimate must pick the hybrid, like the measured path
    val (dupDir, dupDf) = bandsLike(copies = 20)
    CommitLog.appendAlways(dupDf, dupDir)
    assert(autoCompact(dupDir).layout == "p1", "inflating payload must pick the hybrid")
    // unique payload per row: no locality to lose → stays partitioned
    val (uniqDir, uniqDf) = bandsLike(copies = 1)
    CommitLog.appendAlways(uniqDf, uniqDir)
    assert(autoCompact(uniqDir).layout == "p16", "non-inflating payload must stay partitioned")
  }

  private def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs(): Unit
      Option(src.listFiles()).getOrElse(Array.empty)
        .foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }
}
