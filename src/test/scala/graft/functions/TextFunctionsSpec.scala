package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("tokenCount counts whitespace-delimited tokens") {
    val df = Seq("one two  three", "", "  ", "single").toDF("text")
    val counts = df.select(TextFunctions.tokenCount($"text")).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(3, 0, 0, 1))
  }

  test("tokens lowercases and strips punctuation") {
    val toks = Seq("Hello, World! it's fine.").toDF("text")
      .select(TextFunctions.tokens($"text")).collect().head.getSeq[String](0)
    assert(toks == Seq("hello", "world", "it's", "fine"))
  }

  test("charShingles produces distinct k-grams; short text falls back to whole text") {
    val sh = Seq("abcde").toDF("text")
      .select(TextFunctions.charShingles($"text", 3)).collect().head.getSeq[String](0)
    assert(sh.toSet == Set("abc", "bcd", "cde"))
    val short = Seq("ab").toDF("text")
      .select(TextFunctions.charShingles($"text", 3)).collect().head.getSeq[String](0)
    assert(short == Seq("ab"))
  }

  test("wordShingles produces n-grams of tokens") {
    val sh = Seq("a b c d").toDF("text")
      .select(TextFunctions.wordShingles(TextFunctions.tokens($"text"), 2))
      .collect().head.getSeq[String](0)
    assert(sh.toSet == Set("a b", "b c", "c d"))
  }

  test("simhash64: equal text equal hash; similar text close in Hamming distance") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog and runs far away"),
      ("b", "the quick brown fox jumps over the lazy dog and runs far away"),
      ("c", "the quick brown fox jumps over the lazy cat and runs far away"),
      ("d", "completely unrelated text about astrophysics telescopes galaxies quasars")
    ).toDF("id", "text")
    val h = df.select($"id", TextFunctions.simhash64($"text")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h("a") == h("b"))
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(h("a"), h("c")) < hamming(h("a"), h("d")))
    assert(hamming(h("a"), h("c")) <= 16)
  }

  test("langGuess identifies hand-written samples in all five languages") {
    // NOTE: the synthetic documents table's `lang` column is a random
    // label unrelated to its (English word-soup) text, so accuracy
    // against it is meaningless; real multilingual prose is the
    // behavior that matters.
    val samples = Seq(
      ("en", "The quick brown fox jumps over the lazy dog and it was the best of times for all of the animals."),
      ("de", "Der schnelle braune Fuchs springt über den faulen Hund und das ist eine gute Sache für die Tiere im Wald."),
      ("fr", "Le renard brun rapide saute sur le chien paresseux et c'est une bonne chose pour les animaux dans la forêt."),
      ("es", "El zorro marrón rápido salta sobre el perro perezoso y es una buena cosa para los animales en el bosque."),
      ("zh", "敏捷的棕色狐狸跳过了懒惰的狗这对森林里的动物来说是一件好事")
    ).toDF("expected", "text")
    val got = samples.select($"expected", TextFunctions.langGuess($"text").as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), s"text misclassified: $r"))
  }

  test("langGuess runs distributed over the documents table without error") {
    val dist = docs.groupBy(TextFunctions.langGuess(col("text")).as("lang_guess")).count()
    assert(dist.collect().map(_.getLong(1)).sum == docs.count())
  }

  test("qualityScore stays in [0,1] and favors clean prose over junk") {
    val df = Seq(
      ("clean", "This is a reasonably long and well formed paragraph of English text. " * 3),
      ("junk", "!!!! ???? ;;;; :::: ,,,, ....")
    ).toDF("id", "text")
    val scores = df.select($"id", TextFunctions.qualityScore($"text")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores("clean") > scores("junk"))
  }

  test("bpeTokenCountApprox splits letter runs into <=4-char chunks, counts digits/punct singly") {
    val counts = Seq("hello", "a b", "12.5!", "internationalization").toDF("text")
      .select(TextFunctions.bpeTokenCountApprox($"text")).collect().map(_.getInt(0))
    // hello -> hell+o (2); a b -> 2; 12.5! -> 1,2,.,5,! (5); 20 letters -> 5 chunks
    assert(counts.toSeq == Seq(2, 2, 5, 5))
  }

  test("fingerprint64 is deterministic and content-sensitive") {
    val fp = Seq("x", "x", "y").toDF("text")
      .select(TextFunctions.fingerprint64($"text")).collect().map(_.getLong(0))
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("winnowing: shared substring guarantees a shared fingerprint; disjoint text shares none") {
    val base = "the quick brown fox jumps over the lazy dog while the band plays on"
    val df = Seq(
      ("whole", base),
      ("embedded", "PREFIX PREFIX " + base + " SUFFIX SUFFIX"),
      ("unrelated", "astrophysics telescopes galaxies quasars nebulae supernovae redshift")
    ).toDF("id", "text")
    val fps = df.select($"id", TextFunctions.winnowFingerprints($"text", 5, 8))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps("whole") & fps("embedded")).nonEmpty)
    assert((fps("whole") & fps("unrelated")).isEmpty)
    // winnowing selects far fewer fingerprints than raw shingles
    assert(fps("whole").size < base.length - 4)
  }

  test("winnowing is deterministic and non-empty for short texts") {
    val fps = Seq("ab", "").toDF("text")
      .select(TextFunctions.winnowFingerprints($"text")).collect().map(_.getSeq[Long](0))
    assert(fps(0).size == 1) // single shingle -> single fingerprint
    assert(fps(1).size == 1) // empty text -> one shingle ("")
  }

  test("cjkRatio detects Han text") {
    val r = Seq("这是一个中文句子", "pure ascii text").toDF("text")
      .select(TextFunctions.cjkRatio($"text")).collect().map(_.getDouble(0))
    assert(r(0) > 0.5 && r(1) == 0.0)
  }

  test("repetition signals match hand computation") {
    // tokens: a b a b a -> bigrams [a b, b a, a b, b a] (top 2/4 = 0.5)
    //                      trigrams [a b a, b a b, a b a] (dup 1 - 2/3)
    val df = Seq(("looping", "a b a b a"), ("tiny", "xy"), ("empty", ""))
      .toDF("id", "text")
      .select($"id", TextFunctions.tokens($"text").as("ts"))
      .select($"id",
        TextFunctions.topGramFraction(TextFunctions.tokenNgrams($"ts", 2)).as("top2"),
        TextFunctions.dupGramFraction(TextFunctions.tokenNgrams($"ts", 3)).as("dup3"))
    val m = df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m("looping") == ((0.5, 0.333333)))
    // one token -> no bigrams/trigrams -> both 0
    assert(m("tiny") == ((0.0, 0.0)))
    assert(m("empty") == ((0.0, 0.0)))
  }

  test("repetition signals: unique text scores zero duplication") {
    val m = Seq(("u", "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
      .select(TextFunctions.tokens($"text").as("ts"))
      .select(
        TextFunctions.topGramFraction(TextFunctions.tokenNgrams($"ts", 2)).as("top2"),
        TextFunctions.dupGramFraction(TextFunctions.tokenNgrams($"ts", 3)).as("dup3"))
      .head()
    assert(m.getDouble(0) == 0.2) // every bigram unique: top = 1/5
    assert(m.getDouble(1) == 0.0)
  }

  test("redactPii replaces the four span types; counts run on the raw text") {
    val raw = "mail a.b+c@ex-1.org, call +44 (20) 7946-0912, " +
      "see https://ex.org/p?q=1 from 10.0.0.7 ok"
    val out = Seq(raw).toDF("text")
      .select(TextFunctions.redactPii($"text").as("r"), TextFunctions.piiCounts($"text").as("c"))
      .head()
    assert(out.getString(0) ==
      "mail <EMAIL>, call <PHONE>, see <URL> from <IP> ok", out.getString(0))
    val c = out.getStruct(1)
    // n_phone = 2: the dotted quad also matches the phone shape on raw text
    assert((c.getInt(0), c.getInt(1), c.getInt(2), c.getInt(3)) == ((1, 1, 1, 2)), c)
  }

  test("redactPii is identity on clean text") {
    val clean = "plain words with no contact information at all"
    val out = Seq(clean).toDF("text")
      .select(TextFunctions.redactPii($"text")).head().getString(0)
    assert(out == clean)
  }
}
