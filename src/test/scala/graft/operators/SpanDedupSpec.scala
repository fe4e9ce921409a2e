package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def result(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("keep-first removes later occurrences, keeps the first, drops emptied docs") {
    val docs = Seq(
      (0L, "a b c d a b c d"), // span1 duplicates span0 within the doc
      (1L, "a b c d x y"),     // span0 duplicates doc0's; tail span unique
      (2L, "a b c d")          // entirely duplicate text -> doc vanishes
    ).toDF("doc_id", "text")
    val out = result(SpanDedup.dedupSpans(docs, "doc_id", "text", 4))
    assert(out == Map(0L -> "a b c d", 1L -> "x y"))
  }

  test("blank and multi-space documents don't alias onto a shared empty span") {
    // split-on-space used to keep empty tokens: every blank/whitespace doc
    // shared the single span "" and all but one were silently dropped, and
    // "a  b" (double space) span-hashed differently from "a b"
    val docs = Seq(
      (0L, "a  b"),   // double space: empty token must not pad the span
      (1L, "a b"),    // same content as 0 after token cleanup -> duplicate
      (2L, ""),       // blank: no spans, dropped (no content to keep)
      (3L, "   "),    // whitespace-only: same
      (4L, "x y")     // untouched bystander
    ).toDF("doc_id", "text")
    val out = result(SpanDedup.dedupSpans(docs, "doc_id", "text", 2))
    // doc 0 keeps the span (first occurrence, normalized to single space),
    // doc 1 is its duplicate and vanishes; blanks vanish without eating
    // each other's slot; doc 4 survives untouched
    assert(out == Map(0L -> "a b", 4L -> "x y"))
    // scrub path: blanks produce no span rows either (dropped), and the
    // duplicated span is scrubbed from BOTH docs at maxOccurrences=1
    val scrubbed = result(SpanDedup.scrubFrequentSpans(docs, "doc_id", "text", 2, 1))
    assert(scrubbed == Map(4L -> "x y"))
  }

  test("unique corpus passes through unchanged (incl. short tail spans)") {
    val docs = Seq((0L, "a b c"), (1L, "d e f g h")).toDF("doc_id", "text")
    val out = result(SpanDedup.dedupSpans(docs, "doc_id", "text", 2))
    assert(out == Map(0L -> "a b c", 1L -> "d e f g h"))
  }

  test("spanTokens=1 is token-level global dedup, order preserved") {
    val docs = Seq((0L, "x y x z"), (1L, "y w")).toDF("doc_id", "text")
    val out = result(SpanDedup.dedupSpans(docs, "doc_id", "text", 1))
    // doc0 keeps first x, y, z; second x dropped. doc1's y lost to doc0, keeps w.
    assert(out == Map(0L -> "x y z", 1L -> "w"))
  }

  test("keep-first matches a driver-side brute force on the fixture corpus") {
    val k = 4
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val expected = rows.flatMap { case (id, t) =>
      val spans = t.split(" ").grouped(k).map(_.mkString(" ")).toSeq
      val keep = spans.filter(s => seen.add(s))
      if (keep.nonEmpty) Some(id -> keep.mkString(" ")) else None
    }.toMap
    val out = result(SpanDedup.dedupSpans(docs, "doc_id", "text", k))
    assert(out == expected)
  }

  test("anchored spans catch an offset duplicate the fixed grid provably misses") {
    // doc 1 repeats doc 0's passage shifted by ONE token: every fixed-grid
    // span of doc 1 misaligns with doc 0's grid, so the grid variant finds
    // nothing; content-anchored boundaries re-synchronize after the first
    // anchor, so the shared passage dedups away
    val passage = (0 until 64).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, passage),
      (1L, "pad " + passage)
    ).toDF("doc_id", "text")
    val grid = result(SpanDedup.dedupSpans(docs, "doc_id", "text", 8))
    assert(grid == Map(0L -> passage, 1L -> ("pad " + passage)),
      s"fixed grid unexpectedly deduped the shifted copy: $grid")
    val anchored = result(SpanDedup.dedupSpansAnchored(docs, "doc_id", "text", 8))
    assert(anchored(0L) == passage, "the first occurrence must survive whole")
    val survivors1 = anchored.getOrElse(1L, "").split(" ").filter(_.nonEmpty)
    // doc 1 keeps the pad and at most the pre-anchor head fragment of the
    // passage (tokens before the first content anchor); everything after
    // the first anchor is recognized as duplicate text and removed
    assert(survivors1.length < 64 / 2,
      s"anchored variant kept ${survivors1.length} of 65 shifted tokens: ${anchored.get(1L)}")
    assert(survivors1.headOption.contains("pad"))
  }

  test("anchored span boundaries are shift-invariant (same interior spans at any offset)") {
    // the same passage at three different offsets inside otherwise-unique
    // documents: all interior copies dedup to the first occurrence
    val passage = (0 until 48).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (0L, passage),
      (1L, "x1 " + passage),
      (2L, "y1 y2 y3 " + passage)
    ).toDF("doc_id", "text")
    val out = result(SpanDedup.dedupSpansAnchored(docs, "doc_id", "text", 8))
    assert(out(0L) == passage)
    // boundaries re-synchronize exactly at the first anchor token of the
    // passage (md5 hex digit '0' — p22 for this vocabulary): each shifted
    // copy keeps precisely the passage tokens BEFORE that anchor, and
    // everything from the anchor on dedups to doc 0's copy
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val firstAnchor = (0 until 48).indexWhere(i => md5hex(s"p$i").startsWith("0"))
    assert(firstAnchor > 0 && firstAnchor < 48, "test vocabulary needs an interior anchor")
    val kept1 = out.getOrElse(1L, "").split(" ").count(_.startsWith("p"))
    val kept2 = out.getOrElse(2L, "").split(" ").count(_.startsWith("p"))
    assert(kept1 == firstAnchor && kept2 == firstAnchor,
      s"shifted copies kept $kept1/$kept2, expected the $firstAnchor pre-anchor tokens")
  }

  test("scrubFrequentSpans removes every occurrence above the cap") {
    val docs = Seq(
      (0L, "a b a b c d"), // "a b" occurs 3x corpus-wide (2 here, 1 in doc1)
      (1L, "a b e f"),
      (2L, "c d c d")      // "c d" occurs 3x too
    ).toDF("doc_id", "text")
    val out = result(SpanDedup.scrubFrequentSpans(docs, "doc_id", "text", 2, maxOccurrences = 2))
    // "a b" (3 occurrences) and "c d" (3) both exceed the cap of 2 ->
    // every occurrence removed; doc0 and doc2 lose all spans and vanish
    assert(out == Map(1L -> "e f"))
  }

  test("scrub with maxOccurrences=1 strips all duplicated text") {
    val docs = Seq((0L, "p q r s"), (1L, "p q t u")).toDF("doc_id", "text")
    val out = result(SpanDedup.scrubFrequentSpans(docs, "doc_id", "text", 2, maxOccurrences = 1))
    assert(out == Map(0L -> "r s", 1L -> "t u"))
  }

  /** The pre-r19 anchoredSpans, VERBATIM: token-row explode + running-max
    * window + (doc, segment, sub-span) aggregate. The row-local rewrite
    * must reproduce its span rows exactly.
    */
  private def anchoredSpansReference(
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(
        col(idCol).as("__doc"),
        filter(split(col(textCol), " "), t => t =!= "").as("__t"))
      .select(col("__doc"), posexplode_outer(col("__t")).as(Seq("__pos", "__tok")))
      .where(col("__tok").isNotNull)
    val runningSeg = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = toks.withColumn(
      "__segStart",
      max(when(col("__pos") === 0 ||
        substring(md5(col("__tok")), 1, 1) === "0", col("__pos"))).over(runningSeg))
    seg
      .groupBy(
        col("__doc"), col("__segStart"),
        ((col("__pos") - col("__segStart")) / lit(k)).cast("int").as("__sub"))
      .agg(
        min(col("__pos")).as("__idx"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok")),
          " ").as("__span"))
      .select(col("__doc"), col("__idx"), col("__span"), xxhash64(col("__span")).as("__sh"))
  }

  test("row-local anchored spans == the window/aggregate reference (randomized)") {
    val rnd = new scala.util.Random(20260818)
    // alphabet chosen so anchors actually fire: md5 first hex '0' has
    // p=1/16 per distinct token; 40 tokens guarantees several anchored
    // docs across 120 documents, plus crafted edge shapes
    val vocab = (0 until 40).map(i => s"w$i")
    val random = (0 until 120).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val edges = Seq(
      (1000L, ""), (1001L, "   "), (1002L, "solo"),
      (1003L, ("x " * 25).trim),          // one run sub-split by k
      (1004L, vocab.mkString(" ")))       // every token distinct
    val docs = (random ++ edges).toDF("doc_id", "text")
    for (k <- Seq(1, 3, 8)) {
      val got = SpanDedup.anchoredSpans(docs, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      val want = anchoredSpansReference(docs, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(got == want, s"anchored spans diverge from reference at k=$k")
    }
  }
}
