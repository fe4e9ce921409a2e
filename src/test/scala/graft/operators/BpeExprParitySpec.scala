package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Pins the r18 string-packed regexp_replace implementation of
  * [[Bpe.tokensCol]] to a reference greedy fold (the pre-r18 semantics:
  * left-to-right scan, merge when (last(acc), cur) == (l, r), merged
  * output never re-merges as the LEFT side within the same pass) on
  * randomized adversarial inputs — short alphabets force the
  * overlapping/adjacent/self-merge edge cases (aa·a, ab·ab, symbol
  * prefixes) the regex anchoring must get right.
  */
class BpeExprParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refApplyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    syms.foreach { s =>
      if (out.nonEmpty && out.last == l && s == r) out(out.size - 1) = l + r
      else out += s
    }
    out.toVector
  }

  private def refTokens(text: String, merges: Seq[BpeMerge]): Vector[String] = {
    val wordRe = "[\\p{L}\\p{N}']+".r
    wordRe.findAllIn(text.toLowerCase).toVector.flatMap { w =>
      val chars = w.map(_.toString).toVector // test words are ASCII
      merges.foldLeft(chars)((s, m) => refApplyMerge(s, m.lft, m.rgt))
    }
  }

  test("tokensCol == reference greedy fold on randomized words and merges") {
    val rnd = new scala.util.Random(181) // deterministic
    val alphabet = "ab"
    def word(): String =
      (1 to (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def sym(): String =
      (1 to (1 + rnd.nextInt(2))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 8).foreach { trial =>
      val docs = (0 until 40).map(i => (i.toLong, (1 to (1 + rnd.nextInt(5))).map(_ => word()).mkString(" ")))
      // merge list over the same tiny alphabet: later merges may
      // reference earlier merged symbols (cascades) or never fire
      var vocab = Vector("a", "b")
      val merges = (1 to (1 + rnd.nextInt(7))).map { step =>
        val (l, r) =
          if (rnd.nextBoolean() && vocab.size > 2)
            (vocab(rnd.nextInt(vocab.size)), vocab(rnd.nextInt(vocab.size)))
          else (sym(), sym())
        vocab :+= (l + r)
        BpeMerge(step, l, r, l + r, 1L)
      }
      val got = docs.toDF("doc_id", "text")
        .select($"doc_id", Bpe.tokensCol($"text", merges).as("toks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      docs.foreach { case (id, text) =>
        val want = refTokens(text, merges)
        assert(got(id) == want,
          s"trial=$trial doc=$id text='$text' merges=${merges.map(m => (m.lft, m.rgt))}")
      }
    }
  }

  test("tokensCol parity on the classic overlap shapes") {
    val cases = Seq(
      ("aaaa aaa", Seq(BpeMerge(1, "a", "a", "aa", 1L))), // non-overlap greed
      ("abab", Seq(BpeMerge(1, "a", "b", "ab", 1L))), // adjacent re-match
      ("abbb", Seq(BpeMerge(1, "ab", "b", "abb", 1L),
        BpeMerge(2, "abb", "b", "abbb", 1L))), // cascade across passes
      // mid-symbol guard: (x,a) makes symbol "xa"; (a,b) must NOT fire
      // inside it — packed "xa␁b␁" contains the unanchored "a␁b␁"
      ("xab", Seq(BpeMerge(1, "x", "a", "xa", 1L),
        BpeMerge(2, "a", "b", "ab", 1L))),
      ("a abc", Seq(BpeMerge(1, "a", "ab", "aab", 1L))) // prefix guard
    )
    cases.foreach { case (text, merges) =>
      val got = Seq((1L, text)).toDF("doc_id", "text")
        .select(Bpe.tokensCol($"text", merges).as("toks"))
        .collect()(0).getSeq[String](0).toVector
      assert(got == refTokens(text, merges), s"text='$text'")
    }
  }

  test("tokensCol null text yields null, not an empty array (ADVICE r18)") {
    val merges = Seq(BpeMerge(1, "a", "b", "ab", 1L))
    val rows = Seq((1L, null: String), (2L, ""), (3L, "ab"))
      .toDF("doc_id", "text")
      .select($"doc_id", Bpe.tokensCol($"text", merges).as("toks"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isEmpty, "null text must stay null (pre-r18 fold semantics)")
    assert(rows(2L).map(_.asInstanceOf[scala.collection.Seq[_]].toList).contains(Nil),
      "empty text tokenizes to an empty array")
    assert(rows(3L).map(_.asInstanceOf[scala.collection.Seq[_]].toList).contains(List("ab")))
  }
}
