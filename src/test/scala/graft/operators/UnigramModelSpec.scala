package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus: "the" x 6, "cat" x 2, "dog" x 2, "rare" x 1, "unseen" excluded by V
  private val docs = Seq(
    (1L, "the the the cat dog"),
    (2L, "the the the cat dog rare")
  ).toDF("doc_id", "text")

  test("fit counts the full corpus; score matches hand-computed integer rarity") {
    val (model, total) = UnigramModel.fit(docs, "text", size = 4)
    assert(total == 11L)
    assert(model == Map("the" -> 6L, "cat" -> 2L, "dog" -> 2L, "rare" -> 1L))
    val out = UnigramModel.score(docs, "doc_id", "text", model, total)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1: points = 3*(11 div 6) + (11 div 2) + (11 div 2) = 3*1 + 5 + 5 = 13; mean 13/5
    assert(out(1L) == ((5, 0.0, 2.6)))
    // doc 2 adds "rare": 13 + (11 div 1) = 24; mean 4.0
    assert(out(2L) == ((6, 0.0, 4.0)))
  }

  test("OOV tokens hit the floor count and the oov_rate") {
    val (model, total) = UnigramModel.fit(docs, "text", size = 2) // keeps the, cat (ties: cat < dog)
    assert(model.keySet == Set("the", "cat"))
    val out = UnigramModel.score(
      Seq((9L, "the dog")).toDF("doc_id", "text"), "doc_id", "text", model, total)
      .head()
    // dog is OOV: points = (11 div 6) + (11 div 1) = 12; mean 6.0; oov 1/2
    assert(out.getInt(1) == 2 && out.getDouble(2) == 0.5 && out.getDouble(3) == 6.0)
  }

  test("scoreLarge (broadcast-join path) is value-exact with the literal path") {
    val (model, total) = UnigramModel.fit(docs, "text", size = 4)
    val modelDf = model.toSeq.toDF("token", "cnt")
    val in = docs.union(Seq((3L, ""), (4L, "unseen tokens only here")).toDF("doc_id", "text"))
    val literal = UnigramModel.score(in, "doc_id", "text", model, total)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    // literalThreshold = 0 forces the explode + broadcast-join plan
    val joined = UnigramModel.scoreLarge(in, "doc_id", "text", modelDf, total, literalThreshold = 0)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(literal == joined)
    assert(joined(3L) == ((0, 0.0, 0.0))) // empty doc survives the outer explode
    assert(joined(4L)._2 == 1.0)          // all-OOV doc
    // below the threshold it delegates to the literal projection
    val delegated = UnigramModel.scoreLarge(in, "doc_id", "text", modelDf, total)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(delegated == literal)
  }

  test("rarer documents score strictly higher") {
    val (model, total) = UnigramModel.fit(docs, "text", size = 4)
    val common = UnigramModel.score(Seq((1L, "the the the")).toDF("doc_id", "text"),
      "doc_id", "text", model, total).head().getDouble(3)
    val rare = UnigramModel.score(Seq((2L, "rare rare rare")).toDF("doc_id", "text"),
      "doc_id", "text", model, total).head().getDouble(3)
    assert(rare > common)
  }
}
