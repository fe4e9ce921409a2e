package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Sennrich et al.'s worked example shape: low/lower/newest/widest
  private lazy val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("learn fuses the most frequent pair each step, ties lexicographic") {
    // pair counts over types weighted by freq: es=9 (newest 6 + widest 3),
    // st=9, lo=7, ow=7, ne=6, ew=6, we=8 (lower 2 + newest 6)... compute:
    // low:5 l-o,o-w; lower:2 l-o,o-w,w-e,e-r; newest:6 n-e,e-w,w-e,e-s,s-t;
    // widest:3 w-i,i-d,d-e,e-s,s-t
    // l-o 7, o-w 7, w-e 8, e-r 2, n-e 6, e-w 6, e-s 9, s-t 9, w-i 3, i-d 3, d-e 3
    // step1: tie e-s vs s-t at 9 → 'e' < 's' → merge (e,s)->es
    // step2: now es-t appears 9 (newest 6 + widest 3): (es,t) 9 wins
    val model = Bpe.learn(corpus, "text", steps = 3)
    val got = model.merges.map(m => (m.step, m.lft, m.rgt, m.merged, m.pairCount))
    assert(got.take(2) == Seq((1, "e", "s", "es", 9L), (2, "es", "t", "est", 9L)))
    // step3: l-o 7 ties o-w 7 (low 5 + lower 2 each) → 'l' < 'o'
    assert(got(2) == ((3, "l", "o", "lo", 7L)))
  }

  test("driver and distributed paths learn identical merges and segmentations") {
    val local = Bpe.learn(corpus, "text", steps = 5)
    val dist = Bpe.learn(corpus, "text", steps = 5, maxDriverWords = 0L)
    assert(local.merges == dist.merges)
    def seg(m: BpeModel) = m.wordTokens
      .select($"word", $"syms")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg(local) == seg(dist))
  }

  test("greedy fold matches scan semantics on overlapping pairs") {
    // 'aaaa' with merge (a,a): greedy non-overlap → [aa, aa]; 'aaa' → [aa, a]
    val df = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val model = Bpe.learn(df, "text", steps = 1)
    assert(model.merges.map(m => (m.lft, m.rgt)) == Seq(("a", "a")))
    val segs = model.wordTokens.select($"word", $"syms")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segs("aaaa") == Seq("aa", "aa"))
    assert(segs("aaa") == Seq("aa", "a"))
    // distributed fold agrees on the same overlap edge
    val dist = Bpe.learn(df, "text", steps = 1, maxDriverWords = 0L)
    val dsegs = dist.wordTokens.select($"word", $"syms")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(dsegs == segs)
  }

  test("tokenCounts sums per-word segment lengths per document") {
    val model = Bpe.learn(corpus, "text", steps = 2) // es, est learned
    // after (e,s)+(es,t): low=[l,o,w] 3; lower=[l,o,w,e,r] 5;
    // newest=[n,e,w,est] 4; widest=[w,i,d,est] 4
    val counts = Bpe.tokenCounts(corpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 15L, 2L -> 10L, 3L -> 24L, 4L -> 12L))
  }

  test("learning stops early when no pair reaches minCount or none remain") {
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // (a,b) count 2, (c,d) count 1 — minCount=2 learns exactly one merge
    val m1 = Bpe.learn(tiny, "text", steps = 10, minCount = 2L)
    assert(m1.merges.map(m => (m.lft, m.rgt, m.pairCount)) == Seq(("a", "b", 2L)))
    // single-char words: no adjacent pairs at all → zero merges
    val chars = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.learn(chars, "text", steps = 3).merges.isEmpty)
    assert(Bpe.learn(chars, "text", steps = 3, maxDriverWords = 0L).merges.isEmpty)
  }

  test("supplementary-plane symbols: driver == distributed (code-point split)") {
    // U+10437 (Deseret) is outside the BMP: a UTF-16 code-unit split
    // would cut it into lone surrogates, which UTF-8/UTF8String encode
    // as replacement chars — collapsing distinct symbols. Both paths
    // must segment per CODE POINT and learn identical merges.
    val d = new String(Character.toChars(0x10437))
    val e = new String(Character.toChars(0x10438))
    val docs = Seq((1L, s"$d$e$d$e $d$e"), (2L, s"$e$d")).toDF("doc_id", "text")
    val local = Bpe.learn(docs, "text", steps = 2)
    val dist = Bpe.learn(docs, "text", steps = 2, maxDriverWords = 0L)
    assert(local.merges.nonEmpty)
    assert(local.merges == dist.merges)
    assert(local.merges.head.lft == d && local.merges.head.rgt == e)
    def seg(m: BpeModel) = m.wordTokens.select($"word", $"syms")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg(local) == seg(dist))
  }

  test("saving over an existing model dir replaces it atomically") {
    val m3 = Bpe.learn(corpus, "text", steps = 3)
    val m5 = Bpe.learn(corpus, "text", steps = 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe-retrain").toString
    Bpe.save(m3, dir)
    Bpe.save(m5, dir) // retrain in place: marker dropped first, re-committed last
    assert(Bpe.load(spark, dir).merges == m5.merges)
  }

  test("tokensCol segments unseen words with the shipped merges alone") {
    val model = Bpe.learn(corpus, "text", steps = 2) // (e,s) then (es,t)
    // 'bestest' never appears in the corpus: chars b,e,s,t,e,s,t →
    // (e,s): [b,es,t,es,t] → (es,t): [b,est,est]
    val out = Seq((1L, "bestest lowest"))
      .toDF("doc_id", "text")
      .select(Bpe.tokensCol($"text", model.merges).as("toks"))
      .collect()(0).getSeq[String](0)
    // lowest: l,o,w,e,s,t → [l,o,w,es,t] → [l,o,w,est]
    assert(out == Seq("b", "est", "est", "l", "o", "w", "est"))
    // and on the training vocab it reproduces wordTokens exactly
    val viaExpr = model.wordTokens
      .select($"word", Bpe.tokensCol($"word", model.merges).as("e"), $"syms")
      .where(not($"e" === $"syms"))
    assert(viaExpr.count() == 0)
  }

  test("tokensCol enforces the measured merge-count ceiling") {
    // BpeDepthProbe measured the analyzer hard-failing at ~97 nested
    // folds (Resolution maxIterations=100); the enforced ceiling is 64.
    val mk = (n: Int) => (1 to n).map(i => BpeMerge(i, s"x$i", s"y$i", s"x${i}y$i", 1L))
    val df = Seq((1L, "bestest lowest")).toDF("doc_id", "text")
    // at the ceiling: builds, analyzes, and evaluates
    val atCeiling = df.select(Bpe.tokensCol($"text", mk(Bpe.MaxExprMerges)).as("t"))
    assert(atCeiling.selectExpr("size(t)").as[Int].head() > 0)
    // one past the ceiling: refused at composition time with the reroute hint
    val e = intercept[IllegalArgumentException] {
      Bpe.tokensCol($"text", mk(Bpe.MaxExprMerges + 1))
    }
    assert(e.getMessage.contains("tokenCounts"))
  }

  test("save/load round-trips the model; load refuses an uncommitted dir") {
    val model = Bpe.learn(corpus, "text", steps = 3)
    val dir = java.nio.file.Files.createTempDirectory("bpe-model").toString
    Bpe.save(model, dir)
    val loaded = Bpe.load(spark, dir)
    assert(loaded.merges == model.merges)
    val before = Bpe.tokenCounts(corpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = Bpe.tokenCounts(corpus, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before)
    // a dir without the final metadata commit (crash mid-save) is refused
    val torn = java.nio.file.Files.createTempDirectory("bpe-torn").toString
    mergesDfCopy(dir, torn)
    val e = intercept[IllegalArgumentException](Bpe.load(spark, torn))
    assert(e.getMessage.contains("_model.json"))
  }

  private def mergesDfCopy(from: String, to: String): Unit = {
    // copy only the data dirs, not _model.json — simulates the crash window
    import scala.jdk.CollectionConverters._
    val src = java.nio.file.Paths.get(from)
    java.nio.file.Files.walk(src).iterator().asScala
      .filter(p => !p.getFileName.toString.startsWith("_model"))
      .foreach { p =>
        val dst = java.nio.file.Paths.get(to).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
  }

  test("property: incremental == naive full-recount == distributed on random corpora") {
    // the driver path's inverted-index delta updates must be observably
    // identical to recounting every pair from scratch each step (the
    // textbook formulation), and to the distributed loop. Small alphabet
    // + duplicate-heavy corpora force deep merge chains and count ties.
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nWords = 3 + rng.nextInt(12)
      val words = Seq.fill(nWords)(
        (1 to (1 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(4)).toChar).mkString)
      val docs = words.zipWithIndex.flatMap { case (w, i) =>
        Seq.fill(1 + rng.nextInt(5))(w -> i.toLong)
      }
      val df = docs.zipWithIndex.map { case ((w, _), i) => (i.toLong, w) }.toDF("doc_id", "text")
      val steps = 1 + rng.nextInt(6)

      // naive reference: full pair recount every step, same tie-break
      var ref = Vector.empty[(String, String, Long)]
      var state = docs.map(_._1).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
        .map { case (w, c) => (w.split("").toVector, c) }.toVector
      var halted = false
      for (_ <- 1 to steps if !halted) {
        val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
        for ((syms, c) <- state; i <- 0 until syms.length - 1)
          pc.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
        if (pc.isEmpty) halted = true
        else {
          val ((l, r), c) = pc.toSeq.minBy { case ((pl, pr), pcc) => (-pcc, pl, pr) }
          ref = ref :+ ((l, r, c))
          state = state.map { case (syms, cnt) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            for (s <- syms)
              if (acc.nonEmpty && acc.last == l && s == r) acc(acc.length - 1) = l + r
              else acc += s
            (acc.toVector, cnt)
          }
        }
      }

      val local = Bpe.learn(df, "text", steps = steps)
      assert(local.merges.map(m => (m.lft, m.rgt, m.pairCount)) == ref,
        s"trial $trial: incremental != naive (words=$words steps=$steps)")
      val dist = Bpe.learn(df, "text", steps = steps, maxDriverWords = 0L)
      assert(dist.merges == local.merges, s"trial $trial: distributed != incremental")
    }
  }

  test("encodeSink: streaming encode == batch encode, exactly-once across restart") {
    val model = Bpe.learn(corpus, "text", steps = 2)
    val dir = java.nio.file.Files.createTempDirectory("bpe-sink").toString
    val src = java.nio.file.Files.createTempDirectory("bpe-sink-src").toString
    val ckpt = s"$dir-ckpt"
    val half1 = corpus.where($"doc_id" <= 2)
    val half2 = corpus.where($"doc_id" > 2)
    half1.write.mode("append").parquet(src)
    def stream() = spark.readStream.schema(corpus.schema).parquet(src)
    Bpe.encodeSink(stream(), "doc_id", "text", model, s"$dir/enc", ckpt)
      .awaitTermination()
    half2.write.mode("append").parquet(src)
    // restart from the same checkpoint: only the new file's docs land
    Bpe.encodeSink(stream(), "doc_id", "text", model, s"$dir/enc", ckpt)
      .awaitTermination()
    val streamed = graft.streaming.CommitLog.read(spark, s"$dir/enc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Bpe.tokenCounts(corpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("matches the corpus fixture's DuckDB-checked shape at sf0.001") {
    // the oracle prototype (same algorithm in SQL) produced these exact
    // first merges on /root/testdata/sf0.001/documents.parquet — pin them
    // so the gate's oracle and the operator can't drift apart silently
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.learn(docs, "text", steps = 3)
    assert(model.merges.map(m => (m.step, m.lft, m.rgt, m.merged, m.pairCount)) ==
      Seq((1, "e", "r", "er", 4650L), (2, "o", "r", "or", 2880L), (3, "i", "n", "in", 2858L)))
  }
}
