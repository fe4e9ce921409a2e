package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VocabSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat",
    "the dog sat",
    "a cat and a dog"
  ).toDF("text")

  test("build ranks by count desc then token asc, with contiguous ids") {
    val v = Vocab.build(docs, "text", size = 4)
      .select($"token", $"cnt", $"id").as[(String, Long, Int)].collect().sortBy(_._3).toSeq
    // counts: the=3, a=2, cat=2, dog=2, sat=2, and=1, mat=1, on=1
    assert(v == Seq(("the", 3L, 0), ("a", 2L, 1), ("cat", 2L, 2), ("dog", 2L, 3)))
  }

  test("minCount filters the tail before the cut") {
    val v = Vocab.build(docs, "text", size = 10, minCount = 2)
      .select($"token").as[String].collect().toSet
    assert(v == Set("the", "a", "cat", "dog", "sat"))
  }

  test("encodeColumn maps in-vocab tokens to rank ids and OOV to -1") {
    val vm = Vocab.toMap(Vocab.build(docs, "text", size = 4))
    val ids = Seq("the cat flew").toDF("text")
      .select(Vocab.encodeColumn($"text", vm).as("ids"))
      .as[Seq[Int]].head()
    assert(ids == Seq(0, 2, -1))
  }

  test("encode: literal and broadcast-join paths agree, including empty docs and OOV") {
    val vocab = Vocab.build(docs, "text", size = 8)
    val in = Seq((1L, "the cat flew"), (2L, ""), (3L, "a dog and a cat")).toDF("doc_id", "text")
    val literal = Vocab.encode(in, "doc_id", "text", vocab, literalThreshold = 1000)
      .as[(Long, Seq[Int])].collect().toMap
    val joined = Vocab.encode(in, "doc_id", "text", vocab, literalThreshold = 0)
      .as[(Long, Seq[Int])].collect().toMap
    assert(literal == joined)
    assert(literal(2L) == Seq.empty)
    assert(literal(1L).last == -1) // "flew" is OOV on both paths
  }

  test("encode survives a 50k-entry vocab (no giant literal in the plan)") {
    // a vocab this size must NOT be inlined: the join path never builds
    // the map literal, so codegen sees only the join, not 50k map entries
    val big = spark.range(50000).select(
      concat(lit("w"), $"id").as("token"), $"id".cast("int").as("id"))
    val in = Seq((1L, "w0 w49999 nope w123"), (2L, "w7 w7 w8")).toDF("doc_id", "text")
    val out = Vocab.encode(in, "doc_id", "text", big, literalThreshold = 4096)
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(0, 49999, -1, 123))
    assert(out(2L) == Seq(7, 7, 8))
  }

  test("encode then decode through the inverse map round-trips in-vocab tokens") {
    val vm = Vocab.toMap(Vocab.build(docs, "text", size = 8))
    val inv = vm.map(_.swap)
    val text = "the dog sat on the mat"
    val ids = Seq(text).toDF("text")
      .select(Vocab.encodeColumn($"text", vm).as("ids")).as[Seq[Int]].head()
    val decoded = ids.map(i => if (i == -1) "<unk>" else inv(i)).mkString(" ")
    assert(decoded == text)
  }
}
