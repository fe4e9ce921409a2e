package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
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
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      checkpoint = s"$work/ckpt")
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

  test("at-least-once replay of a committed batch changes nothing (no self-pairs, no dupes)") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-replay").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = Seq((1L, base), (2L, base),
      (3L, "completely different text about spark partitions " * 5)).toDF("id", "text")
    val b2 = Seq((10L, base + "tail."),
      (11L, "yet another unrelated document body " * 6)).toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20)
    // crash window: the batch appended its pairs AND its index entries but
    // the checkpoint commit was lost — the restarted stream replays it
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20)
    StreamingDedup.processBatch(b2, work, 0.9, 5, 120, 20)
    val streamed = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.Dedup
      .nearDuplicates(b1.union(b2).toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.9, numHashes = 120, bands = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"replayed streamed=$streamed batch=$batch")
    assert(!streamed.exists(p => p._1 == p._2), s"self-pairs after replay: $streamed")
  }

  test("batchId'd processing is exactly-once: raw pair rows hold no duplicates after replay") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-eo").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = Seq((1L, base), (2L, base)).toDF("id", "text")
    val b2 = Seq((10L, base + "tail.")).toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L)) // replayed
    StreamingDedup.processBatch(b2, work, 0.9, 5, 120, 20, batchId = Some(1L))
    // RAW read, no distinct: the commit log itself must hold each pair once
    val raw = CommitLog.read(spark, s"$work/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(raw.size == raw.distinct.size, s"duplicate raw pairs after replay: $raw")
    assert(raw.toSet == Set((1L, 2L), (1L, 10L), (2L, 10L)))
  }

  test("legacy pre-sigb bands index migrates in place and still yields cross-batch pairs") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-legacy").toString
    // build a real index for batch 0 with the current code...
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = Seq((1L, base),
      (3L, "completely different text about spark partitions " * 5)).toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
    // ...then simulate a PRE-UPGRADE workDir: the bands log frozen with
    // the 3-column schema and data files carrying no sigb at all
    val bandsDir = s"$work/bands"
    val legacyRows = CommitLog.read(spark, bandsDir).drop("sigb").collect().toSeq
    val legacySchema = org.apache.spark.sql.types.StructType(
      CommitLog.schemaOf(bandsDir).filterNot(_.name == "sigb"))
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rm(_))
      java.nio.file.Files.deleteIfExists(p): Unit
    }
    rm(java.nio.file.Paths.get(bandsDir))
    CommitLog.init(bandsDir, legacySchema)
    CommitLog.append(
      spark.createDataFrame(spark.sparkContext.parallelize(legacyRows), legacySchema),
      bandsDir, 0L)
    assert(CommitLog.schemaOf(bandsDir).fieldNames.toSeq == Seq("id", "band", "bucket"))
    // the next batch must (a) not fail analysis against the legacy log —
    // processBatch migrates the schema in place — and (b) still find the
    // cross-batch duplicate: legacy rows read with sigb = null, and the
    // null-tolerant prefilter routes them to exact verification instead
    // of silently dropping every candidate against the old index
    val b2 = Seq((10L, base + "tail.")).toDF("id", "text")
    StreamingDedup.processBatch(b2, work, 0.9, 5, 120, 20, batchId = Some(1L))
    assert(CommitLog.schemaOf(bandsDir).fieldNames.contains("sigb"), "schema not migrated")
    val pairs = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)), s"cross-batch pair against legacy index missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positives: $pairs")
  }

  test("restart from checkpoint resumes the index and converges to the batch oracle") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-restart").toString
    val src = java.nio.file.Files.createTempDirectory("sdedup-src").toString
    val ckpt = s"$work/ckpt"
    val a = Seq((1L, base), (2L, base),
      (3L, "completely different text about spark partitions " * 5)).toDF("id", "text")
    val b = Seq((10L, base + "tail."),
      (11L, "yet another unrelated document body " * 6)).toDF("id", "text")
    a.write.mode("append").parquet(src)
    def stream() = spark.readStream.schema(a.schema).parquet(src)
    // run 1: processes A, commits the checkpoint, dies
    val q1 = StreamingDedup.incrementalNearDuplicates(
      stream(), "id", "text", work, threshold = 0.9, numHashes = 120, bands = 20,
      checkpoint = ckpt)
    q1.awaitTermination()
    // more data lands while the stream is down
    b.write.mode("append").parquet(src)
    // run 2: same checkpoint — must resume (keep A's index, process only B)
    val q2 = StreamingDedup.incrementalNearDuplicates(
      stream(), "id", "text", work, threshold = 0.9, numHashes = 120, bands = 20,
      checkpoint = ckpt)
    q2.awaitTermination()
    val streamed = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.Dedup
      .nearDuplicates(a.union(b).toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.9, numHashes = 120, bands = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"restarted streamed=$streamed batch=$batch")
  }

  test("compactIndex bounds file counts across a long replay without changing the pairs") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-compact").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    // a long replay: 8 batches, each appending files to all three datasets
    (0 until 8).foreach { b =>
      val docs = Seq(
        (b * 10L + 1, base + s" batch $b"),
        (b * 10L + 2, s"unique filler text for batch $b " * 6)).toDF("id", "text")
      StreamingDedup.processBatch(docs, work, 0.9, 5, 120, 20)
    }
    val preCompact = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def countParquet(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(countParquet).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    def files(d: String) = countParquet(new java.io.File(s"$work/$d"))
    assert(files("bands") > 8, s"replay should have fragmented the bands index, got ${files("bands")} files")
    val stats = StreamingDedup.compactIndex(spark, work)
    assert(stats.forall { case (_, (b4, af)) => af <= b4 }, s"compaction grew a dataset: $stats")
    assert(files("bands") <= 2 && files("shingles") <= 2 && files("pairs") <= 2,
      s"file counts not bounded: bands=${files("bands")} shingles=${files("shingles")} pairs=${files("pairs")}")
    assert(StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == preCompact)
  }

  test("bucketed bands compaction: probes prune to touched partitions, pairs unchanged") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-bucketed").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = (1L to 16L).map(i =>
      (i, if (i == 1L) base else s"unique document number $i with its own content " * 6))
      .toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
    // force the partitioned layout: 16 docs × 20 bands = 320 rows > 10
    // (bands pinned to the bucket-hash layout — AUTO could measure its
    // way to the hybrid at this fixture size, which is its own test)
    val stats = StreamingDedup.compactIndex(spark, work, targetRecordsPerFile = 10L,
      bandsPartitions = StreamingDedup.FollowIndexPartitions)
    val files = CommitLog.currentFiles(s"$work/bands")
    assert(files.forall(_.contains(s"/__p${StreamingDedup.IndexPartitions}=")),
      s"bands not bucket-partitioned after compaction: ${files.take(3)}")
    assert(stats("bands")._2 <= StreamingDedup.IndexPartitions.toLong)
    // a 1-doc batch touches ≤ 20 of the 64 partitions → pruning must
    // keep a strict subset of the index files
    val oneDoc = Seq((10L, base + "tail.")).toDF("id", "text")
    val touched = oneDoc
      .select(graft.operators.Dedup.minhashSignature(col("text"), 5, 120).as("sig"))
      .select(posexplode(transform(sequence(lit(0), lit(19)),
        b => xxhash64(slice(col("sig"), b * 6 + 1, lit(6))))).as(Seq("band", "bucket")))
      .select(pmod(xxhash64(col("band"), col("bucket")),
        lit(StreamingDedup.IndexPartitions.toLong)).cast("int").as("p"))
      .distinct().collect().map(_.getInt(0)).toSet
    val pruned = StreamingDedup.pruneBandFiles(
      files, Map(StreamingDedup.IndexPartitions -> touched))
    assert(pruned.size < files.size,
      s"pruning kept everything: ${pruned.size} of ${files.size}")
    // and the pruned probe still finds the cross-batch duplicate
    StreamingDedup.processBatch(oneDoc, work, 0.9, 5, 120, 20, batchId = Some(1L))
    val pairs = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)), s"cross-batch pair missing after compaction: $pairs")
    assert(!pairs.exists(p => p._1 != 1L && p._2 != 10L), s"false positives: $pairs")
  }

  test("partitioned shingles compaction: verify reads prune to candidate partitions, pairs unchanged") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-shprune").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = (1L to 16L).map(i =>
      (i, if (i == 1L) base else s"unique document number $i with its own content " * 6))
      .toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
    StreamingDedup.compactIndex(spark, work, targetRecordsPerFile = 10L, indexPartitions = 32)
    val shFiles = CommitLog.currentFiles(s"$work/shingles")
    assert(shFiles.forall(_.contains("/__p32=")),
      s"shingles not id-partitioned after compaction: ${shFiles.take(3)}")
    // a 1-duplicate batch's candidates touch ≤ a few of the 32 id
    // partitions → the verify scan must keep a strict subset of files
    // (candidate ids here: 1 (old) and 10 (new); old id 1's partition
    // is the only one the accumulated log can contribute)
    val touched = Set(
      spark.range(1).select(pmod(xxhash64(lit(1L)), lit(32L)).cast("int"))
        .collect()(0).getInt(0),
      spark.range(1).select(pmod(xxhash64(lit(10L)), lit(32L)).cast("int"))
        .collect()(0).getInt(0))
    val pruned = StreamingDedup.pruneBandFiles(shFiles, Map(32 -> touched))
    assert(pruned.size < shFiles.size,
      s"shingle pruning kept everything: ${pruned.size} of ${shFiles.size}")
    // the pruned verify still confirms the cross-batch duplicate with
    // the exact jaccard, and nothing else
    val oneDoc = Seq((10L, base + "tail.")).toDF("id", "text")
    StreamingDedup.processBatch(oneDoc, work, 0.9, 5, 120, 20, batchId = Some(1L))
    val pairs = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 10L)), s"expected exactly the cross pair: $pairs")
    // and a batch ingested AGAINST the partitioned layout appends
    // unpartitioned files that later batches must still read whole
    // (pruneBandFiles keeps path-unpartitioned files unconditionally)
    val shAfter = CommitLog.currentFiles(s"$work/shingles")
    val plain = shAfter.filterNot(_.contains("/__p32="))
    assert(plain.nonEmpty, "batch append lost its unpartitioned shingle file")
    assert(StreamingDedup.pruneBandFiles(shAfter, Map(32 -> Set.empty[Int]))
      .toSet == plain.toSet, "prune must never drop unpartitioned appends")
  }

  test("bandsPartitions=1 keeps bands id-sorted (hybrid marker) while shingles still partition") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-nightly").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = (1L to 16L).map(i =>
      (i, if (i == 1L) base else s"unique document number $i with its own content " * 6))
      .toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
    StreamingDedup.compactIndex(spark, work, targetRecordsPerFile = 10L,
      indexPartitions = 32, bandsPartitions = 1)
    // the hybrid layout carries the __p1=0 marker (so re-compactions
    // recognize the base and stay minor) but never bucket-partitions
    val bandFiles = CommitLog.currentFiles(s"$work/bands")
    assert(bandFiles.nonEmpty && bandFiles.forall(_.contains("/__p1=0/")),
      s"bands should carry the sorted-hybrid marker: ${bandFiles.take(3)}")
    assert(CommitLog.currentFiles(s"$work/shingles").forall(_.contains("/__p32=")),
      "shingles must still partition")
    // and the mixed layout still finds the cross-batch duplicate exactly
    val oneDoc = Seq((10L, base + "tail.")).toDF("id", "text")
    StreamingDedup.processBatch(oneDoc, work, 0.9, 5, 120, 20, batchId = Some(1L))
    val pairs = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 10L)), s"expected exactly the cross pair: $pairs")
  }

  test("minor compaction folds only the delta: base tiers carried by reference, pairs unchanged") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-tiered").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = (1L to 16L).map(i =>
      (i, if (i == 1L) base else s"unique document number $i with its own content " * 6))
      .toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
    val major = StreamingDedup.compactIndexDetailed(spark, work, targetRecordsPerFile = 10L)
    assert(major("bands").mode == "major" && major("shingles").mode == "major", s"$major")
    val baseBands = CommitLog.currentFiles(s"$work/bands").toSet
    val baseSh = CommitLog.currentFiles(s"$work/shingles").toSet
    // mtimes of the base files: a minor compaction must never rewrite them
    def mtimes(d: String, fs: Set[String]) =
      fs.map(f => f -> new java.io.File(s"$work/$d/$f").lastModified).toMap
    val bandMt = mtimes("bands", baseBands)
    val b2 = Seq((20L, base + "tail."), (21L, "more unrelated filler words here " * 6))
      .toDF("id", "text")
    StreamingDedup.processBatch(b2, work, 0.9, 5, 120, 20, batchId = Some(1L))
    val minor = StreamingDedup.compactIndexDetailed(spark, work, targetRecordsPerFile = 10L)
    assert(minor("bands").mode == "minor" && minor("shingles").mode == "minor", s"$minor")
    val afterBands = CommitLog.currentFiles(s"$work/bands").toSet
    val afterSh = CommitLog.currentFiles(s"$work/shingles").toSet
    assert(baseBands.subsetOf(afterBands), "base bands tier not carried by reference")
    assert(baseSh.subsetOf(afterSh), "base shingles tier not carried by reference")
    assert(bandMt.forall { case (f, t) => new java.io.File(s"$work/bands/$f").lastModified == t },
      "minor compaction rewrote a carried base file")
    // every file is now in SOME tier of the layout (no loose appends left)
    assert(afterBands.forall(_.contains("/__p")) && afterSh.forall(_.contains("/__p")))
    assert(minor("bands").tiers == 2 && minor("shingles").tiers == 2, s"$minor")
    // a re-run with nothing appended is a no-op
    val noop = StreamingDedup.compactIndexDetailed(spark, work, targetRecordsPerFile = 10L)
    assert(noop("bands").mode == "noop" && noop("shingles").mode == "noop", s"$noop")
    // and the tiered layout still yields exactly the batch operator's pairs
    val streamed = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.Dedup
      .nearDuplicates(b1.union(b2).toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.9, numHashes = 120, bands = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // duplicates found AFTER the tiered compaction still land: the
    // probe against BOTH tiers must equal the batch operator's pairs
    val b3 = Seq((30L, base + " extra")).toDF("id", "text")
    StreamingDedup.processBatch(b3, work, 0.9, 5, 120, 20, batchId = Some(2L))
    val p3 = StreamingDedup.pairs(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch3 = graft.operators.Dedup
      .nearDuplicates(b1.union(b2).union(b3).toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.9, numHashes = 120, bands = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(p3 == batch3, s"cross-tier probe diverged: streamed=$p3 batch=$batch3")
    assert(p3.exists(p => p._2 == 30L), s"no pair found for the post-compaction doc: $p3")
  }

  test("maxTiers forces a major rewrite that collapses the tiers back to one") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-maxtiers").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    def ingest(b: Long): Unit = StreamingDedup.processBatch(
      (1L to 8L).map(i => (b * 100 + i, s"doc $b $i body " * 6)).toDF("id", "text"),
      work, 0.9, 5, 120, 20, batchId = Some(b))
    ingest(0L)
    assert(StreamingDedup.compactIndexDetailed(spark, work, targetRecordsPerFile = 10L,
      maxTiers = 2)("bands").mode == "major")
    ingest(1L)
    assert(StreamingDedup.compactIndexDetailed(spark, work, targetRecordsPerFile = 10L,
      maxTiers = 2)("bands").mode == "minor")
    ingest(2L)
    // a second minor would make 3 tiers > maxTiers=2 → major, one tier
    val forced = StreamingDedup.compactIndexDetailed(spark, work, targetRecordsPerFile = 10L,
      maxTiers = 2)
    assert(forced("bands").mode == "major" && forced("bands").tiers == 1, s"$forced")
  }

  test("AUTO bands layout follows an explicitly chosen base across minor compactions") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sdedup-auto").toString
    StreamingDedup.incrementalNearDuplicatesInit(spark, work)
    val b1 = (1L to 16L).map(i => (i, s"unique document number $i body " * 6)).toDF("id", "text")
    StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
    // owner pins the hybrid; later AUTO maintenance must extend it, not flap
    StreamingDedup.compactIndex(spark, work, targetRecordsPerFile = 10L, bandsPartitions = 1)
    StreamingDedup.processBatch(Seq((20L, "late arrival words " * 6)).toDF("id", "text"),
      work, 0.9, 5, 120, 20, batchId = Some(1L))
    val auto = StreamingDedup.compactIndexDetailed(spark, work, targetRecordsPerFile = 10L)
    assert(auto("bands").mode == "minor" && auto("bands").layout == "p1", s"$auto")
    assert(CommitLog.currentFiles(s"$work/bands").forall(_.contains("/__p1=0/")))
  }

  test("forced verify semi filter yields exactly the direct plan's pairs") {
    import spark.implicits._
    val b1 = Seq((1L, base), (2L, base),
      (3L, "completely different text about spark partitions " * 5)).toDF("id", "text")
    val b2 = Seq((10L, base + "tail."), (11L, base),
      (12L, "yet another unrelated document body " * 6)).toDF("id", "text")
    def run(): Set[(Long, Long, Double)] = {
      val work = java.nio.file.Files.createTempDirectory("sdedup-semi").toString
      StreamingDedup.incrementalNearDuplicatesInit(spark, work)
      StreamingDedup.processBatch(b1, work, 0.9, 5, 120, 20, batchId = Some(0L))
      StreamingDedup.processBatch(b2, work, 0.9, 5, 120, 20, batchId = Some(1L))
      StreamingDedup.pairs(spark, work)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val direct = run() // tiny log — the gate picks the direct plan
    spark.conf.set(StreamingDedup.VerifySemiFilterConf, "-1") // force semi
    val semi =
      try run()
      finally spark.conf.unset(StreamingDedup.VerifySemiFilterConf)
    assert(semi == direct, s"semi=$semi direct=$direct")
    assert(direct.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 10L), (2L, 10L),
      (1L, 11L), (2L, 11L), (10L, 11L)), s"unexpected pair set: $direct")
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
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      checkpoint = s"$work/ckpt")
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
