package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BigramModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fit counts unigrams, bigrams and total in one pass") {
    val lm = BigramModel.fit(Seq((0L, "a b a b")).toDF("doc_id", "text"), "text")
    assert(lm.totalTokens == 4L)
    val uni = lm.uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 2L, "b" -> 2L))
    val bi = lm.bi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi == Map("a b" -> 2L, "b a" -> 1L))
  }

  test("score: seen conditional points, OOV backoff, short docs drop") {
    val lm = BigramModel.fit(Seq((0L, "a b a b")).toDF("doc_id", "text"), "text")
    val scored = BigramModel
      .score(Seq((1L, "a b c"), (2L, "b a"), (3L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", lm)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // doc1: "a b" seen -> n(a)=2 div n("a b")=2 = 1;
    //       "b c" unseen, c OOV -> 2 * (4 div 1) = 8; mean 4.5
    assert(scored(1L) == ((2L, 0.5, 4.5)))
    // doc2: "b a" seen -> n(b)=2 div 1 = 2
    assert(scored(2L) == ((1L, 0.0, 2.0)))
    // doc3: one token, no bigrams -> absent
    assert(!scored.contains(3L))
  }

  test("empty fit corpus scores everything as backoff with total 0") {
    val lm = BigramModel.fit(Seq.empty[(Long, String)].toDF("doc_id", "text"), "text")
    assert(lm.totalTokens == 0L)
    val scored = BigramModel
      .score(Seq((1L, "x y")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect()
    // unseen, total 0 -> 2 * (0 div 1) = 0 points
    assert(scored.length == 1 &&
      scored.head.getDouble(2) == 1.0 && scored.head.getDouble(3) == 0.0)
  }

  test("fit-on-slice, score-all matches per-doc recomputation on fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lm = BigramModel.fit(docs.where($"doc_id" % 2 === 0), "text")
    val scored = BigramModel.score(docs, "doc_id", "text", lm)
    assert(scored.count() == docs.count())
    // every row is internally consistent: unseen_rate in [0,1], points >= 1
    // per bigram when total > 0 and nothing is OOV-floor-degenerate
    val bad = scored.where(
      org.apache.spark.sql.functions.col("unseen_rate") < 0 ||
        org.apache.spark.sql.functions.col("unseen_rate") > 1 ||
        org.apache.spark.sql.functions.col("mean_points") < 1.0).count()
    assert(bad == 0)
  }
}
