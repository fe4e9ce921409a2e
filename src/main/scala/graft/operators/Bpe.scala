package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import scala.collection.mutable

/** One learned BPE merge: at `step`, the adjacent symbol pair
  * (`lft`, `rgt`) — the corpus-most-frequent at that point, ties broken
  * lexicographically — was fused into `merged`, with `pairCount`
  * weighted occurrences at decision time.
  */
case class BpeMerge(step: Int, lft: String, rgt: String, merged: String, pairCount: Long)

/** A trained BPE model: the ordered merge list plus the final per-word
  * segmentation (`wordTokens`: word, cnt, syms) the merges imply over
  * the training vocabulary.
  */
final class BpeModel(val merges: Seq[BpeMerge], val wordTokens: DataFrame)

/** Byte-pair-encoding tokenizer TRAINING — the step an LLM data
  * pipeline runs before any token-budget accounting is meaningful
  * (token_count/bpe_token_count in [[graft.functions.TextFunctions]]
  * only approximate a tokenizer; this learns one from the corpus).
  *
  * Algorithm (Sennrich et al. 2016, the standard word-type
  * formulation): tokenize the corpus into words, count word TYPES
  * (word → frequency) — the only pass that ever touches the corpus —
  * then iterate on the vocabulary-sized type table: each step counts
  * adjacent symbol pairs weighted by word frequency, fuses the most
  * frequent pair (count desc, then left/right symbol ascending — a
  * total order, so training is deterministic), and re-segments every
  * word by a greedy left-to-right scan.
  *
  * Scale shape (100 TB): the corpus contributes ONE map-side-combined
  * word-count shuffle; every subsequent step is O(|vocab|), not
  * O(corpus). Even a 100 TB web corpus has ~10^7-10^8 word types, so
  * after the count the working set is GB-scale. Two execution paths,
  * same results by construction (BpeSpec pins equality):
  *
  *  - driver path (vocab ≤ `maxDriverWords`): collect (word, cnt) and
  *    run the merge loop locally — zero Spark jobs per step; this is
  *    how production tokenizer trainers work. Pair counts build ONCE and
  *    update incrementally through an inverted pair→word index, so a
  *    merge step costs O(affected words), not O(total symbols) — the
  *    property that makes vocabulary-scale (30k+) step counts viable.
  *  - distributed path: the type table stays a DataFrame; each step is
  *    one map-side-combined pair-count aggregate + a TakeOrdered top-1
  *    (one row to the driver) + a codegen'd fold re-segmentation.
  *    Lineage is cut periodically. For vocabularies too big for the
  *    driver — or steps small enough that per-step job overhead is
  *    acceptable.
  */
object Bpe {

  /** Steps between localCheckpoint lineage cuts on the distributed
    * path: each step adds one projection (whose fold expression
    * references the symbol array exactly once, so collapsed expression
    * size stays linear in steps); cutting every 16 keeps plans shallow
    * without paying a materialization every step (the per-step persist
    * already bounds recompute).
    */
  val CutEverySteps = 16

  /** Ceiling on [[tokensCol]]'s composed merge chain. Historically a
    * hard analyzer limit: the pre-r18 nested-fold implementation
    * consumed ~1 analyzer Resolution iteration per merge and HARD-FAILED
    * at ~97 ("Max iterations (100) reached for batch Resolution" —
    * measured by [[graft.tools.BpeDepthProbe]]). The r18 string-packed
    * regexp_replace chain no longer nests lambdas, but the ceiling stays:
    * one linear regex pass per merge over every document is still the
    * wrong shape past the tens-of-merges regime — a vocabulary-scale
    * encoder belongs on [[tokenCounts]]' word→segment-table probe.
    */
  val MaxExprMerges = 64

  /** Initial symbols of a word, one per CODE POINT (`.` in Java regex
    * matches a full code point; a word from [[TextFunctions.tokens]]
    * never contains line terminators). `split("")` would cut supplementary
    * characters into lone UTF-16 surrogates, which UTF8String/UTF-8
    * encode as replacement chars — collapsing distinct symbols and
    * diverging from the driver path and the DuckDB oracle.
    */
  private def charsCol(w: Column): Column = regexp_extract_all(w, lit("."), lit(0))

  /** Learn `steps` merges over `textCol` of `docs`. Stops early if no
    * adjacent pair reaches `minCount`. Word tokenization is
    * [[TextFunctions.tokens]] (the library-wide convention); initial
    * symbols are single characters.
    */
  def learn(
      docs: DataFrame,
      textCol: String,
      steps: Int,
      minCount: Long = 1L,
      maxDriverWords: Long = 1000000L
  ): BpeModel = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = docs.sparkSession
    val wordCounts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nWords = wordCounts.count()
      if (nWords <= maxDriverWords) learnLocal(spark, wordCounts, steps, minCount)
      else learnDistributed(wordCounts, steps, minCount)
    } finally wordCounts.unpersist(blocking = false)
  }

  /** The learned merges as a DataFrame (step, lft, rgt, merged,
    * pair_count) — the artifact a pipeline persists beside its corpus.
    */
  def mergesDf(spark: SparkSession, merges: Seq[BpeMerge]): DataFrame = {
    import spark.implicits._
    merges.toDF("step", "lft", "rgt", "merged", "pair_count")
  }

  /** BPE token sequence of `text` computed from the merge list ALONE —
    * the shipped-tokenizer behavior: words never seen in training still
    * segment correctly (greedy merges over their characters), which the
    * [[tokenCounts]] vocabulary join cannot do. Pure projection (no
    * shuffle): the document is packed into one separator-delimited
    * string and each merge is one linear regexp_replace pass (see
    * [[tokensColUnchecked]] for the equivalence argument to the greedy
    * fold). Enforced ceiling [[MaxExprMerges]] = 64: the right shape
    * for the tens-of-merges regime (feature hashing, sub-token stats);
    * a vocabulary-scale encoder (30k merges) must use [[tokenCounts]]'
    * word→segment-table probe, which is how real trainers ship a
    * tokenizer.
    */
  def tokensCol(text: Column, merges: Seq[BpeMerge]): Column = {
    require(merges.size <= MaxExprMerges,
      s"tokensCol composes one replace pass per merge into a single expression " +
        s"chain — viable for the tens-of-merges regime but not a vocabulary-scale " +
        s"tokenizer (got ${merges.size} merges, ceiling $MaxExprMerges, measured " +
        s"by graft.tools.BpeDepthProbe). Encode through the model's word→segment " +
        s"table instead (Bpe.tokenCounts / BpeModel.wordTokens) — that is how " +
        s"production tokenizers ship a 30k-merge vocabulary.")
    tokensColUnchecked(text, merges)
  }

  /** [[tokensCol]] without the merge-count ceiling — for the depth probe
    * that MEASURES the ceiling. Not a public API.
    */
  private[graft] def tokensColUnchecked(text: Column, merges: Seq[BpeMerge]): Column = {
    import java.util.regex.{Matcher, Pattern}
    // String-packed greedy merge (r18 optimization): the whole document
    // becomes ONE string — each word's symbols SymSep-TERMINATED
    // ("a␁b␁c␁"), words joined by WordSep — and every merge is one
    // linear regexp_replace pass instead of a nested per-element
    // aggregate() fold (which rebuilt an O(n) array per element, O(n²)
    // per merge per word, and dominated the encode gate's runtime).
    //
    // replaceAll == the greedy fold, by construction:
    //  - leftmost-first, resuming AFTER each replacement = the fold's
    //    left-to-right scan where a merged symbol never re-merges as
    //    the LEFT side within the same pass;
    //  - a match consumes its trailing SymSep, so the pattern's leading
    //    anchor cannot fire on the merged output either — merged output
    //    only participates again on the NEXT merge's pass, exactly like
    //    the fold chain;
    //  - the (?:^|(?<=[SymSep WordSep])) anchor pins matches to symbol
    //    STARTS and the trailing SymSep in the pattern pins symbol ENDS,
    //    so "xa␁b␁" never merges on (a,b) and (a,b) never fires on
    //    "a␁bc␁" — same comparisons the fold makes on whole symbols;
    //  - patterns contain only token chars and SymSep, so they can never
    //    span a WordSep: merges stay within words.
    // Token chars are [\p{L}\p{N}'] (TextFunctions.tokens), so the two
    // control-char separators never collide with symbol content.
    // BpeExprParitySpec holds this path equal to a reference fold on
    // randomized symbol/merge streams.
    val seeded = concat_ws(WordSep,
      transform(TextFunctions.tokens(text), w =>
        regexp_replace(w, lit("(.)"), lit("$1" + SymSep))))
    val merged = merges.foldLeft(seeded)((s, m) =>
      regexp_replace(s,
        lit(s"(?:^|(?<=[$SymSep$WordSep]))" + Pattern.quote(m.lft + SymSep + m.rgt + SymSep)),
        lit(Matcher.quoteReplacement(m.lft + m.rgt + SymSep))))
    // back to the token array: drop word boundaries, split on SymSep
    // (the trailing separator leaves one empty slot; real tokens are
    // never empty, so the length filter only strips that artifact).
    // NULL text stays NULL (ADVICE r18): concat_ws swallows the null
    // token array, so the packed pipeline alone would return [] where
    // the pre-r18 fold chain (and the null-in-null-out convention of
    // every other text expression here) returned null.
    when(text.isNotNull,
      filter(split(translate(merged, WordSep, ""), Pattern.quote(SymSep)),
        t => length(t) > 0))
  }

  /** Separators for the string-packed segment representation in
    * [[tokensColUnchecked]]: SymSep terminates every symbol, WordSep
    * divides words. Both are control chars [[TextFunctions.tokens]] can
    * never emit.
    */
  private val SymSep = "\u0001"
  private val WordSep = "\u0002"

  /** Per-document token count under the trained model: explode words,
    * probe the word→segment-length table (vocab-sized — Spark
    * auto-broadcasts it when it fits, the corpus side never shuffles
    * before the final per-doc aggregate), sum. Documents whose words
    * all fall outside the training vocabulary (e.g. an empty text)
    * produce no row, matching a relational join's semantics.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String, model: BpeModel): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .join(model.wordTokens.select(col("word").as("__w"), size(col("syms")).as("__nt")), "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__nt")).as("bpe_tokens"))

  /** Streaming encode through a trained model: each arrival batch
    * encodes batch-locally ([[tokenCounts]] — complete per document,
    * since a document arrives as one row) and appends to a CommitLog
    * table exactly-once (replayed batch ids are skipped). Training stays
    * a batch job by nature; this is the serving half — new corpus
    * partitions stream through a FROZEN model, the nightly-ingest shape.
    */
  def encodeSink(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      model: BpeModel,
      dir: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    graft.streaming.CommitLog.init(dir, StructType(Seq(
      StructField(idCol, stream.schema(idCol).dataType, nullable = true),
      StructField("bpe_tokens", LongType, nullable = true))))
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        graft.streaming.CommitLog.append(
          tokenCounts(batch, idCol, textCol, model), dir, bid): Unit
      }
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .start()
  }

  // ---------------------------------------------------------------
  // model persistence
  // ---------------------------------------------------------------

  /** Persist a trained model: `merges.parquet` (the ordered merge list —
    * the artifact every consumer needs) + `word_tokens.parquet` (the
    * training vocabulary's final segmentation, what [[tokenCounts]]
    * probes) + `_model.json` LAST via tmp + ATOMIC_MOVE. Saving over an
    * EXISTING model drops the commit marker before touching any data —
    * so a crash at ANY point mid-save (fresh dir or retrain-in-place)
    * leaves a directory [[load]] refuses, never a mixed or torn model.
    */
  def save(model: BpeModel, dir: String): Unit = {
    val spark = model.wordTokens.sparkSession
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, "_model.json"))
    mergesDf(spark, model.merges)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges.parquet")
    model.wordTokens.write.mode("overwrite").parquet(s"$dir/word_tokens.parquet")
    val meta = s"""{"steps": ${model.merges.size}}"""
    val tmp = java.nio.file.Paths.get(dir, "_model.json.tmp")
    java.nio.file.Files.writeString(tmp, meta)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, "_model.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Load a model [[save]]d to `dir`. The merge list (small by
    * construction — one row per learned merge) collects to the driver;
    * the vocabulary-sized segmentation table stays a DataFrame.
    */
  def load(spark: SparkSession, dir: String): BpeModel = {
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_model.json")),
      s"$dir is not a committed BPE model (missing _model.json — interrupted save?)")
    val merges = spark.read.parquet(s"$dir/merges.parquet")
      .select(col("step"), col("lft"), col("rgt"), col("merged"), col("pair_count"))
      .orderBy(col("step"))
      .collect()
      .map(r => BpeMerge(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq
    new BpeModel(merges, spark.read.parquet(s"$dir/word_tokens.parquet"))
  }

  // ---------------------------------------------------------------
  // driver path
  // ---------------------------------------------------------------

  /** UTF-8 byte order, matching Spark's UTF8String binary comparison
    * and DuckDB's default collation, so driver-path tie-breaks equal
    * distributed-path and oracle tie-breaks even beyond ASCII (the same
    * definition of "Spark binary order" BigtableAgg's MIN/MAX uses).
    */
  private def utf8Lt(a: String, b: String): Boolean = utf8Cmp(a, b) < 0

  private def utf8Cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Merge-selection total order: count DESC, then (l, r) ascending in
    * UTF-8 byte order — the same order the per-step scan used, held in a
    * TreeSet so argmax is O(log n) instead of a full pair-table scan.
    */
  private val pairOrd: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        if (x._1 != y._1) java.lang.Long.compare(y._1, x._1)
        else {
          val c = utf8Cmp(x._2, y._2)
          if (c != 0) c else utf8Cmp(x._3, y._3)
        }
      }
    }

  /** One symbol per code point (see [[charsCol]] — `split("")` cuts
    * supplementary characters into lone surrogates).
    */
  private def codePointSyms(w: String): mutable.ArrayBuffer[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf
  }

  private def learnLocal(
      spark: SparkSession,
      wordCounts: DataFrame,
      steps: Int,
      minCount: Long
  ): BpeModel = {
    val words: Array[(mutable.ArrayBuffer[String], Long)] = wordCounts
      .collect()
      .map(r => (codePointSyms(r.getString(0)), r.getLong(1)))
    // pair counts build ONCE; every merge step updates them through the
    // inverted pair→word index, touching only affected words — O(delta)
    // per step. The selection order rides a TreeSet mirror of the count
    // table (count desc, pair asc in UTF-8), so argmax is O(log n) too:
    // with a full per-step pair scan, a vocabulary-scale run pays
    // O(steps x live-pairs) just choosing merges — the term that made
    // "30k steps viable" an unproven claim (doc_bpe_collapse is the gate
    // that now proves it, training to full vocabulary collapse).
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val sortedPairs = mutable.TreeSet.empty[(Long, String, String)](pairOrd)
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def indexWord(idx: Int, syms: mutable.ArrayBuffer[String], cnt: Long, sign: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val before = pairCounts.getOrElse(p, 0L)
        val c = before + sign * cnt
        if (before != 0L) sortedPairs.remove((before, p._1, p._2))
        if (c == 0L) pairCounts.remove(p)
        else { pairCounts.update(p, c); sortedPairs.add((c, p._1, p._2)): Unit }
        if (sign > 0) occ.getOrElseUpdate(p, mutable.HashSet.empty) += idx
        else occ.get(p).foreach { s => s -= idx; if (s.isEmpty) occ.remove(p) }
        i += 1
      }
    }
    var w0 = 0
    while (w0 < words.length) {
      indexWord(w0, words(w0)._1, words(w0)._2, 1L); w0 += 1
    }
    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      if (pairCounts.isEmpty) done = true
      else {
        // argmax: count desc, then (l, r) ascending in UTF-8 byte order —
        // the TreeSet head, maintained incrementally by indexWord
        val (c, l, r) = sortedPairs.head
        if (c < minCount) done = true
        else {
          val m = l + r
          merges += BpeMerge(step, l, r, m, c)
          // only words actually containing (l, r) re-segment
          val affected = occ.get((l, r)).map(_.toArray).getOrElse(Array.emptyIntArray)
          for (idx <- affected) {
            val (syms, cnt) = words(idx)
            indexWord(idx, syms, cnt, -1L)
            // greedy left-to-right fold: merge when the accumulated top
            // is l and the incoming symbol is r (equivalent to scan-and-
            // skip because merged == l would need r to be empty)
            val acc = mutable.ArrayBuffer.empty[String]
            for (s <- syms)
              if (acc.nonEmpty && acc.last == l && s == r) acc(acc.length - 1) = m
              else acc += s
            words(idx) = (acc, cnt)
            indexWord(idx, acc, cnt, 1L)
          }
          step += 1
        }
      }
    }
    import spark.implicits._
    val wordTokens = words.toSeq
      .map { case (syms, cnt) => (syms.mkString, cnt, syms.toSeq) }
      .toDF("word", "cnt", "syms")
    new BpeModel(merges.toSeq, wordTokens)
  }

  // ---------------------------------------------------------------
  // distributed path
  // ---------------------------------------------------------------

  /** Greedy left-to-right merge of adjacent (l, r) into `l+r` as a
    * codegen'd fold over the symbol array. `try_element_at(acc, -1)`
    * (null, never an ANSI error, on the empty accumulator) keeps the
    * first iteration on the append branch.
    */
  private[operators] def applyMergeCol(syms: Column, l: String, r: String): Column = {
    val m = l + r
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(try_element_at(acc, lit(-1)) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(s))))
  }

  private def learnDistributed(
      wordCounts: DataFrame,
      steps: Int,
      minCount: Long
  ): BpeModel = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = wordCounts
      .withColumn("syms", charsCol(col("word")))
      .persist(mem)
    var prev: Option[DataFrame] = None
    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      // pair-count: explode only multi-symbol words; partial aggregation
      // combines map-side, TakeOrdered ships ONE row to the driver
      val best = words
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(
            element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), col("l"), col("r"))
        .limit(1)
        .collect()
      // that action materialized the current `words` cache; the frame it
      // was derived from no longer feeds anything unmaterialized
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      val next = best.headOption.map(b => (b.getString(0), b.getString(1), b.getLong(2)))
      next match {
        case Some((l, r, c)) if c >= minCount =>
          merges += BpeMerge(step, l, r, l + r, c)
          val applied = words.withColumn("syms", applyMergeCol(col("syms"), l, r))
          prev = Some(words)
          words =
            if (step % CutEverySteps == 0) applied.localCheckpoint()
            else applied.persist(mem)
          step += 1
        case _ => done = true
      }
    }
    // step-budget exit leaves the final frame persisted but never
    // materialized (no action ran after the last re-segmentation) —
    // materialize it before releasing the cached frame it reads from,
    // and release that frame (it otherwise leaks for the session's life)
    prev.foreach { p => words.count(); p.unpersist(blocking = false) }
    new BpeModel(merges.toSeq, words.select(col("word"), col("cnt"), col("syms")))
  }
}
