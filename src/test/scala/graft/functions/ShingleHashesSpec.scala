package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r18 native [[ShingleHashes]] expression bit-for-bit to the
  * interpreted column chains it replaced, on randomized inputs that
  * cover the edge regimes: empty text, text shorter than k, exact-k,
  * repeated shingles, and supplementary (surrogate-pair) code points
  * (windows slide by code point, not UTF-16 unit).
  */
class ShingleHashesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def native(text: Column, k: Int, mode: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k, mode))

  // the pre-r18 chains, reproduced verbatim
  private def oldPositional(text: Column, k: Int, md5: Boolean): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i =>
        if (md5) TextFunctions.md5Hash60(text.substr(i, lit(k)))
        else xxhash64(text.substr(i, lit(k))))
  private def oldDistinctSorted(text: Column, k: Int): Column =
    array_sort(transform(TextFunctions.charShingles(text, k), s => xxhash64(s)))

  private val corpus: Seq[String] = {
    val rnd = new scala.util.Random(1818)
    val alphabets = Seq("ab", "abcde ", "the quick brown fox., 0123", "你好世界",
      new String(Character.toChars(0x1F600)) + "a" + new String(Character.toChars(0x1D11E)))
    val rand = (0 until 60).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      // lengths straddle k: 0..2 chars up to ~40
      val len = rnd.nextInt(40)
      (0 until len).map { _ =>
        val cp = a.codePointAt(rnd.nextInt(a.length) match {
          case i if Character.isLowSurrogate(a.charAt(i)) => i - 1
          case i => i
        })
        new String(Character.toChars(cp))
      }.mkString
    }
    rand ++ Seq("", "a", "ab", "abcd", "abcde", "aaaaaaaaaa", "hello world hello world")
  }

  test("XxhPositional == interpreted xxhash64(substr) chain") {
    Seq(2, 5).foreach { k =>
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select($"id", native($"text", k, ShingleHashesImpl.XxhPositional).as("n"),
          oldPositional($"text", k, md5 = false).as("o"))
      val bad = df.where(not($"n" === $"o")).collect()
      assert(bad.isEmpty, s"k=$k: ${bad.take(3).mkString("; ")}")
    }
  }

  test("Md5Positional == interpreted md5Hash60(substr) chain") {
    Seq(2, 5).foreach { k =>
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select($"id", native($"text", k, ShingleHashesImpl.Md5Positional).as("n"),
          oldPositional($"text", k, md5 = true).as("o"))
      val bad = df.where(not($"n" === $"o")).collect()
      assert(bad.isEmpty, s"k=$k: ${bad.take(3).mkString("; ")}")
    }
  }

  test("XxhDistinctSorted == array_sort(xxhash64 over distinct charShingles)") {
    Seq(2, 5).foreach { k =>
      val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select($"id", native($"text", k, ShingleHashesImpl.XxhDistinctSorted).as("n"),
          oldDistinctSorted($"text", k).as("o"))
      val bad = df.where(not($"n" === $"o")).collect()
      assert(bad.isEmpty, s"k=$k: ${bad.take(3).mkString("; ")}")
    }
  }

  test("null text yields null (nullSafeEval), not a sentinel array") {
    val out = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(native($"text", 5, ShingleHashesImpl.Md5Positional).as("n"))
      .collect()(0)
    assert(out.isNullAt(0))
  }
}
