package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Text-analysis building blocks for large-scale training-data
  * pipelines, built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs on the hot path — every helper here stays inside
  * whole-stage codegen; `simhash64` is a native Catalyst expression).
  *
  * These compose over any DataFrame with a string column — typically
  * the `documents` table (TESTDATA.md).
  */
object TextFunctions {

  /** Lowercased word tokens: runs of letters/digits/apostrophes. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[\\p{L}\\p{N}']+"), lit(0))

  /** Whitespace-delimited token count (exact whitespace tokenization). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword token count proxy: letter runs are split into
    * <=4-char chunks, digits and punctuation count one token each —
    * the usual cheap budget estimator when the real tokenizer is too
    * expensive to run at corpus scale.
    */
  def bpeTokenCountApprox(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{L}{1,4}|\\p{N}|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Character k-shingles (distinct), the MinHash input set. Texts
    * shorter than k yield the whole text as a single shingle.
    */
  def charShingles(text: Column, k: Int): Column = {
    val shingled = transform(
      sequence(lit(1), length(text) - (k - 1)),
      i => text.substr(i, lit(k))
    )
    array_distinct(when(length(text) >= k, shingled).otherwise(array(text)))
  }

  /** Word n-grams joined with single spaces (distinct). */
  def wordShingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + 1, lit(n)), " ")
    )
    array_distinct(when(size(toks) >= n, grams).otherwise(array(array_join(toks, " "))))
  }

  /** 64-bit document fingerprint (xxhash64 of the raw text). */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** 60-bit MD5-derived hash of a string column: first 15 hex chars of
    * the digest as a (always non-negative) long. Pure built-ins
    * (md5+conv stay in codegen) and replicable in any SQL engine as
    * `('0x' || substr(md5(s),1,15))::BIGINT` — 60 bits so signed and
    * unsigned interpretations agree (min/sort-safe cross-engine).
    */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** MD5-derived document fingerprint — the verifiability variant of
    * [[fingerprint64]].
    */
  def fingerprint60Md5(text: Column): Column = md5Hash60(text)

  /** Winnowing fingerprints (rolling-window minima over positional
    * char-shingle hashes, MOSS-style): any shared substring of length
    * >= windowW + shingleK - 1 between two documents yields at least
    * one shared fingerprint. Native expression; no shuffle.
    */
  def winnowFingerprints(text: Column, shingleK: Int = 5, windowW: Int = 8): Column = {
    // positional (NOT distinct) shingles: winnowing needs document
    // order. Native ShingleHashes (r18): one compiled pass instead of
    // an interpreted substring+hash lambda per position.
    val shingled = ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(text), shingleK, ShingleHashesImpl.XxhPositional))
    ColumnBridge.column(Winnow(ColumnBridge.expression(shingled), windowW))
  }

  /** Winnowing fingerprints over MD5-derived 60-bit shingle hashes: the
    * verifiability variant of [[winnowFingerprints]] (identical window
    * semantics; only the shingle hash differs, so an external SQL engine
    * can rebuild the positional hashes and window minima exactly).
    */
  def winnowFingerprintsMd5(text: Column, shingleK: Int = 5, windowW: Int = 8): Column = {
    // native positional md5-60 shingle hashes (r18): the interpreted
    // md5 -> hex -> conv round-trip per position was the dominant cost
    // of every winnowing-based gate; ShingleHashesSpec pins equality
    // to the md5Hash60(substr) chain
    val shingled = ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(text), shingleK, ShingleHashesImpl.Md5Positional))
    ColumnBridge.column(Winnow(ColumnBridge.expression(shingled), windowW))
  }

  /** SimHash over word tokens — native Catalyst expression with codegen. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens(text))))

  /** SimHash over word tokens with MD5-derived per-token hashes: slower
    * than the xxh64 default but bit-for-bit replicable by any engine with
    * a standard MD5 (`('0x'||substr(md5(t),1,16))::UBIGINT`) — the
    * verifiability path.
    */
  def simhash64Md5(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens(text)), md5 = true))

  /** Fraction of CJK (Han) characters. */
  def cjkRatio(text: Column): Column =
    regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Punctuation marks per character. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Count of tokens that appear in `words` (with repetition). */
  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(words), t)))

  // Small per-language stopword lists for the n-gram-free heuristic
  // language identifier. Public knowledge (most-frequent function words).
  private val EnStops = Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on", "at", "by", "this")
  private val DeStops = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "auf", "im", "sich", "des")
  private val FrStops = Seq("le", "la", "les", "de", "des", "et", "est", "un", "une", "dans", "que", "pour", "sur", "avec", "au", "pas")
  private val EsStops = Seq("el", "la", "los", "las", "de", "y", "es", "un", "una", "en", "que", "por", "con", "para", "del", "se")

  /** Heuristic language ID over {en, de, fr, es, zh}: CJK ratio first,
    * then argmax of stopword hits; ties resolve in fixed order
    * en > de > fr > es; no hits at all → "und" (undetermined).
    */
  def langGuess(text: Column): Column = {
    val toks = tokens(text)
    val en = stopwordHits(toks, EnStops)
    val de = stopwordHits(toks, DeStops)
    val fr = stopwordHits(toks, FrStops)
    val es = stopwordHits(toks, EsStops)
    when(cjkRatio(text) > 0.05, "zh")
      .when(en === 0 && de === 0 && fr === 0 && es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Quality score in [0, 1] from cheap surface statistics: length
    * saturation, mean word length sanity, moderate punctuation, and
    * alphabetic density — the usual pre-filter heuristics for web-scale
    * training text.
    */
  def qualityScore(text: Column): Column = {
    val nChars = greatest(length(text), lit(1)).cast("double")
    val nToks = greatest(tokenCount(text), lit(1)).cast("double")
    val lenScore = least(nChars / 200.0, lit(1.0))
    val meanWordLen = nChars / nToks
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.25)
    val punctScore = when(punctRatio(text) <= 0.1, 1.0).otherwise(0.5)
    val alphaDensity = regexp_count(text, lit("[\\p{L}]")).cast("double") / nChars
    val alphaScore = least(alphaDensity / 0.6, lit(1.0))
    // round to 6dp, not 4: every component has at most 5 decimal digits
    // (e.g. lenScore = int × 0.00125), so 4dp rounding sits exactly on
    // the .5 boundary where engines' last-ulp differences flip the
    // result — 6dp never needs to round a boundary value
    round((lenScore * 0.25 + wordLenScore * 0.25 + punctScore * 0.2 + alphaScore * 0.3), 6)
  }

  // ===== intra-document repetition signals (Gopher/C4-style filters) ====
  //
  // All three are PURE PROJECTIONS over an already-materialized token
  // array: no explode, no per-gram shuffle — at 100 TB each document's
  // repetition score costs a row-local sort + single pass, the shape a
  // corpus-wide quality filter needs. Callers must stage the token array into its own
  // column first (same staging rule as Decontaminate.ngramsOfTokens:
  // a non-cheap expression referenced inside lambdas re-evaluates per
  // element).

  /** Space-joined token n-grams of an ALREADY-MATERIALIZED token array
    * (empty array below n tokens); duplicates preserved — repetition
    * signals need the multiset.
    */
  def tokenNgrams(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - n + 1),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Fraction of gram occurrences taken by the single most frequent gram
    * (0.0 when there are no grams). A high value means the document loops
    * on one phrase — the "fraction in most common n-gram" filter.
    */
  def topGramFraction(grams: Column): Column = {
    // sort the multiset once, then the longest run of equal ADJACENT grams
    // is exactly the most frequent gram's count — O(n log n) row-local,
    // where the naive distinct×filter scan is quadratic in document length
    val init = struct(
      lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best"))
    val top = aggregate(
      array_sort(grams),
      init,
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(grams) === 0, lit(0.0))
      .otherwise(round(top.cast("double") / size(grams), 6))
  }

  /** Fraction of gram occurrences that are repeats of an earlier gram
    * (1 - distinct/total; 0.0 when there are no grams) — the "duplicate
    * n-gram fraction" filter.
    */
  def dupGramFraction(grams: Column): Column =
    when(size(grams) === 0, lit(0.0))
      .otherwise(round(
        lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 6))

  // --- PII redaction -----------------------------------------------------

  /** Heuristic PII span patterns, ordered (email before URL so a bare
    * address never survives inside a replaced URL's tail; IP before
    * phone so dotted quads aren't phone-matched). Deliberately kept to
    * the regex subset Java and RE2 share (no \b, no backrefs, explicit
    * classes) so a SQL engine applying the same patterns reproduces the
    * output byte-for-byte — the cross-engine determinism contract of
    * this module.
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiUrlRe = "https?://[^ \\t\\n]+"
  val PiiIpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PiiPhoneRe = "\\+?[0-9][0-9 ()./-]{6,}[0-9]"

  /** Replace emails, URLs, IPv4s and phone-like digit spans with typed
    * sentinel tokens — the scrubbing pass a training-data pipeline runs
    * before tokenization. A pure codegen'd regexp_replace chain: no
    * shuffle, no UDF, linear in the text. Heuristic by design (finds
    * the common shapes, not a validator).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, PiiEmailRe, "<EMAIL>"),
          PiiUrlRe, "<URL>"),
        PiiIpRe, "<IP>"),
      PiiPhoneRe, "<PHONE>")

  /** Per-type PII hit counts on the RAW text (before redaction), for
    * scrub-rate monitoring: (n_email, n_url, n_ip, n_phone).
    */
  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(PiiEmailRe)).as("n_email"),
      regexp_count(text, lit(PiiUrlRe)).as("n_url"),
      regexp_count(text, lit(PiiIpRe)).as("n_ip"),
      regexp_count(text, lit(PiiPhoneRe)).as("n_phone"))
}
