package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 docs, N = 4: "rare" df=1 (idf 4), "common" df=4 (idf 1)
  private val docs = Seq(
    (1L, "common words and the rare rare gem"),
    (2L, "common text common again"),
    (3L, "common filler body"),
    (4L, "common nothing else here")
  ).toDF("doc_id", "text")

  test("score = sum tf * (N div df), hand-computed") {
    val out = Retrieval.termSearch(docs, "doc_id", "text", Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    // doc1: rare tf=2 * 4 + common 1*1 = 9; doc2: common 2*1 = 2; docs 3,4: 1
    assert(out == Seq((1L, 9L), (2L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("topK truncates deterministically with id tiebreak; non-matching docs never appear") {
    val out = Retrieval.termSearch(docs, "doc_id", "text", Seq("common"), topK = 2)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 2L), (1L, 1L))) // ties at score 1 resolve to the smaller id
    val none = Retrieval.termSearch(docs, "doc_id", "text", Seq("absent"), topK = 5)
    assert(none.count() == 0)
  }

  test("requireAll keeps only documents containing every query term, both paths") {
    // only doc 1 has both "rare" and "common"
    val direct = Retrieval.termSearch(docs, "doc_id", "text", Seq("rare", "common"),
      topK = 10, requireAll = true).as[(Long, Long)].collect().toSeq
    assert(direct == Seq((1L, 9L)), direct)
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-all").toString
    Retrieval.buildIndex(docs, "doc_id", "text", dir, numBuckets = 4)
    val probed = Retrieval.indexSearch(spark, dir, Seq("rare", "common"),
      topK = 10, requireAll = true).as[(Long, Long)].collect().toSeq
    assert(probed == direct, s"indexed AND-search diverged: $probed")
    // no document has both "rare" and "absent"
    assert(Retrieval.termSearch(docs, "doc_id", "text", Seq("rare", "absent"),
      topK = 10, requireAll = true).count() == 0)
  }

  test("query terms are case-normalized and deduplicated") {
    val a = Retrieval.termSearch(docs, "doc_id", "text", Seq("RARE", "rare"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    val b = Retrieval.termSearch(docs, "doc_id", "text", Seq("rare"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    assert(a == b && a == Seq((1L, 8L)))
  }

  test("plan: final top-k is a TakeOrdered, not a global sort") {
    val df = Retrieval.termSearch(docs, "doc_id", "text", Seq("common"), topK = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("indexSearch == termSearch on every probe; the corpus is never scanned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx").toString
    Retrieval.buildIndex(docs, "doc_id", "text", dir, numBuckets = 8)
    for (q <- Seq(Seq("rare", "common"), Seq("common"), Seq("RARE", "rare"), Seq("absent"))) {
      val direct = Retrieval.termSearch(docs, "doc_id", "text", q, topK = 10)
        .as[(Long, Long)].collect().toSeq
      val probed = Retrieval.indexSearch(spark, dir, q, topK = 10)
        .as[(Long, Long)].collect().toSeq
      assert(probed == direct, s"index/direct divergence for query $q")
    }
    // the search plan reads index files only — no corpus in its scan
    val df = Retrieval.indexSearch(spark, dir, Seq("rare"), topK = 10)
    val scanned = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanned.contains(dir) && !scanned.contains("documents"),
      s"expected only index files in scan leaves:\n$scanned")
  }

  test("appendToIndex folds deltas into search; compactIndex restores one file per bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx3").toString
    val base = docs.where($"doc_id" <= 2)
    val delta = docs.where($"doc_id" > 2)
    Retrieval.buildIndex(base, "doc_id", "text", dir, numBuckets = 4)
    Retrieval.appendToIndex(delta, "doc_id", "text", dir)
    // idf sees the grown corpus: results match a direct search of ALL docs
    val direct = Retrieval.termSearch(docs, "doc_id", "text", Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    val probed = Retrieval.indexSearch(spark, dir, Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    assert(probed == direct, s"post-append divergence: $probed vs $direct")
    val filesBefore = graft.streaming.CommitLog.currentFiles(dir).size
    val first = Retrieval.compactIndex(spark, dir)
    assert(first.mode == "major", s"first compaction must be a major rewrite: $first")
    val filesAfter = graft.streaming.CommitLog.currentFiles(dir).size
    assert(filesAfter < filesBefore, s"compaction did not shrink: $filesBefore -> $filesAfter")
    val afterCompact = Retrieval.indexSearch(spark, dir, Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    assert(afterCompact == direct, "compaction changed results")
    // empty delta is a no-op commit
    Retrieval.appendToIndex(docs.where($"doc_id" < 0), "doc_id", "text", dir)
    assert(Retrieval.indexSearch(spark, dir, Seq("common"), topK = 10).count() == 4)
  }

  test("indexSink: streamed corpus indexed exactly-once across a checkpointed restart") {
    val work = java.nio.file.Files.createTempDirectory("graft-invidx-stream").toString
    val src = s"$work/src"; val dir = s"$work/idx"; val cp = s"$work/cp"
    docs.where($"doc_id" <= 2).write.parquet(src)
    val schema = docs.schema
    def run(): Unit = {
      val st = spark.readStream.schema(schema).parquet(src)
      Retrieval.indexSink(st, "doc_id", "text", dir, checkpoint = cp, numBuckets = 4)
        .awaitTermination()
    }
    run()
    val partial = Retrieval.indexSearch(spark, dir, Seq("common"), topK = 10).count()
    assert(partial == 2, s"first increment indexed $partial docs with 'common'")
    docs.where($"doc_id" > 2).write.mode("append").parquet(src)
    run() // same checkpoint: only the new files index; replays skip
    val direct = Retrieval.termSearch(docs, "doc_id", "text", Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    val streamed = Retrieval.indexSearch(spark, dir, Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    assert(streamed == direct, s"streamed index diverged: $streamed vs $direct")
    // idf corpus count advanced to the full corpus exactly once
    assert(CommitLogAccess.readMeta(dir)._2 == 4L)
  }

  test("tiered maintenance: major, then O(delta) minors carrying the base by reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-tier").toString
    Retrieval.buildIndex(docs.where($"doc_id" <= 2), "doc_id", "text", dir, numBuckets = 4)
    val major = Retrieval.compactIndex(spark, dir)
    assert(major.mode == "major" && major.tiers == 1, s"unexpected first compaction: $major")
    val base = graft.streaming.CommitLog.currentFiles(dir).toSet

    Retrieval.appendToIndex(docs.where($"doc_id" === 3), "doc_id", "text", dir)
    val minor1 = Retrieval.compactIndex(spark, dir)
    assert(minor1.mode == "minor" && minor1.tiers == 2, s"expected a minor fold: $minor1")
    val after1 = graft.streaming.CommitLog.currentFiles(dir).toSet
    assert(base.subsetOf(after1),
      s"minor compaction must carry base files BY REFERENCE: ${base -- after1} rewritten")

    Retrieval.appendToIndex(docs.where($"doc_id" === 4), "doc_id", "text", dir)
    val minor2 = Retrieval.compactIndex(spark, dir)
    assert(minor2.mode == "minor" && minor2.tiers == 3, s"expected a second minor: $minor2")

    // the multi-tier union still answers every probe exactly
    for (q <- Seq(Seq("rare", "common"), Seq("common"), Seq("absent"))) {
      val direct = Retrieval.termSearch(docs, "doc_id", "text", q, topK = 10)
        .as[(Long, Long)].collect().toSeq
      val probed = Retrieval.indexSearch(spark, dir, q, topK = 10)
        .as[(Long, Long)].collect().toSeq
      assert(probed == direct, s"tiered index diverged on $q: $probed vs $direct")
    }
    // every probed file belongs to a layout the query's terms hash into:
    // __b=<k> appends, __p4=<k> compacted tiers (same xxhash64 bucket),
    // or the __p1=0 hybrid (modulus the probe did not compute)
    val probeDf = Retrieval.indexSearch(spark, dir, Seq("rare"), topK = 10)
    probeDf.collect()
    val touched = spark.sql("SELECT CAST(pmod(xxhash64('rare'), 4) AS INT)").head.getInt(0)
    val bad = probeDf.inputFiles.filterNot { f =>
      f.contains(s"__b=$touched/") || f.contains(s"__p4=$touched/") || f.contains("__p1=0/")
    }
    assert(bad.isEmpty, s"probe read files outside its touched buckets: ${bad.toSeq}")

    // past maxTiers the next compaction is a forced major back to 1 tier
    Retrieval.appendToIndex(
      docs.where($"doc_id" === 1).select($"doc_id" + 100 as "doc_id", $"text"),
      "doc_id", "text", dir)
    val forced = Retrieval.compactIndex(spark, dir, maxTiers = 3)
    assert(forced.mode == "major" && forced.tiers == 1, s"expected a forced major: $forced")
    val all = docs.unionAll(
      docs.where($"doc_id" === 1).select($"doc_id" + 100 as "doc_id", $"text"))
    val direct = Retrieval.termSearch(all, "doc_id", "text", Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    val probed = Retrieval.indexSearch(spark, dir, Seq("rare", "common"), topK = 10)
      .as[(Long, Long)].collect().toSeq
    assert(probed == direct, s"post-forced-major divergence: $probed vs $direct")
  }

  test("bucket pruning: a one-term query reads exactly one bucket file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx2").toString
    Retrieval.buildIndex(docs, "doc_id", "text", dir, numBuckets = 8)
    val all = graft.streaming.CommitLog.currentFiles(dir)
    assert(all.size > 1, s"fixture too small to prove pruning: ${all.size} files")
    val df = Retrieval.indexSearch(spark, dir, Seq("rare"), topK = 10)
    val inputs = df.inputFiles.toSeq
    assert(inputs.size == 1, s"expected 1 probed bucket file, got ${inputs.size}: $inputs")
  }
}
