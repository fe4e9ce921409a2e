package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide EXACT duplicate-text removal at sub-document granularity
  * — the "exact substring dedup" step of LLM corpus curation
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better"), approximated at fixed token-span granularity so it runs as
  * three shuffles instead of a distributed suffix array: each document
  * is cut into consecutive non-overlapping `spanTokens`-token spans and
  * a span whose text occurs ANYWHERE else in the corpus survives only
  * at its first occurrence (smallest `(doc, spanIdx)`); documents are
  * reassembled from their surviving spans, and documents made entirely
  * of non-first duplicate text disappear. The whole-document exact
  * dedup in [[Dedup]] is the spanTokens=∞ end of this spectrum; MinHash
  * in [[Dedup]] is the fuzzy complement.
  *
  * Scale shape (100 TB): spans are grouped by `xxhash64` of their text
  * (64-bit identity — the standard dedup-pipeline trade; a collision
  * merges two distinct spans with probability ~2^-64 per pair) so the
  * duplicate-finding aggregate ships 8-byte keys, and because it IS an
  * aggregate, map-side partial combine collapses heavy boilerplate
  * spans (the "repeated 10^9 times" licence header) before the shuffle
  * — the reason this is groupBy+join rather than one window over the
  * span hash, which would funnel every occurrence of a heavy span into
  * a single reducer. The join-back ships only DUPLICATED spans (usually
  * a small fraction of distinct spans); AQE broadcasts it when small,
  * falls back to a hash join on the 8-byte key when not. Reassembly is
  * one shuffle on doc id with per-doc state bounded by document length.
  */
object SpanDedup {

  /** (__doc, __idx, __span, __sh): the corpus cut into k-token spans.
    * Token array staged in its own projection (the span lambda must not
    * re-split per element), and the explode is posexplode_OUTER + a
    * null filter on the generator OUTPUT: a plain posexplode makes
    * InferFiltersFromGenerate synthesize `size(spans) > 0 AND
    * isnotnull(spans)` BELOW the Generate, inlining the whole span
    * construction (split + transform + array_join) into a Filter that
    * re-evaluates it twice more per document — measured 3x the explode
    * cost at sf0.1. The outer generator gets no inferred filter; empty
    * or null token arrays surface as one null span row and are dropped
    * per-SPAN, which is free.
    */
  private[graft] def explodedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    // empty tokens (consecutive/leading/trailing spaces) are dropped so
    // they can't pad spans, and a token-LESS document yields zero spans
    // (not one "" span — that would alias every blank document onto a
    // single hash and dedup all but the first of them away)
    val toks = docs.select(
      col(idCol).as("__doc"),
      filter(split(col(textCol), " "), t => t =!= "").as("__t"))
    val nSpans = ceil(size(col("__t")).cast("double") / lit(k.toDouble)).cast("int")
    val staged = toks.select(
      col("__doc"),
      when(nSpans <= 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), nSpans - 1),
          i => array_join(slice(col("__t"), i * k + 1, lit(k)), " ")))
        .as("__spans"))
    staged
      .select(col("__doc"), posexplode_outer(col("__spans")).as(Seq("__idx", "__span")))
      .where(col("__span").isNotNull)
      .withColumn("__sh", xxhash64(col("__span")))
  }

  /** Cut `textCol` (whitespace-delimited) into consecutive
    * `spanTokens`-token spans (final span may be shorter) and keep only
    * the first global occurrence of each distinct span text. Returns
    * `(idCol, textCol)` with surviving documents reassembled in span
    * order; fully-deduplicated documents are dropped.
    */
  def dedupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int
  ): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1: $spanTokens")
    // NO Spread.small here: span hashing is cheap per row, and the
    // repartition's text shuffle measured SLOWER than the one-split map
    // stage it avoids (0.59 -> 0.76s on the sf0.1 gate)
    keepFirst(explodedSpans(docs, idCol, textCol, spanTokens), idCol, textCol)
  }

  /** Keep-first over any (__doc, __idx, __span, __sh) span frame:
    * duplicated span hashes survive only at the smallest (doc, idx),
    * then documents reassemble from their surviving spans.
    */
  private def keepFirst(exploded: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exploded
      .groupBy(col("__sh"))
      .agg(min(struct(col("__doc"), col("__idx"))).as("__keep"),
        count(lit(1)).as("__n"))
      .where(col("__n") > 1)
      .select(col("__sh"), col("__keep"))
    val kept = exploded
      .join(keepers, Seq("__sh"), "left_outer")
      .where(col("__keep").isNull ||
        (col("__keep.__doc") === col("__doc") && col("__keep.__idx") === col("__idx")))
    reassemble(kept, idCol, textCol)
  }

  /** (__doc, __idx, __span, __sh) with CONTENT-DEFINED span boundaries:
    * a new span starts at every anchor token — one whose `md5` hex
    * rendering starts with '0' (probability 1/16 per distinct token) —
    * and anchor-free runs are sub-split every `k` tokens FROM THE RUN'S
    * START. Both rules depend only on the text, never on absolute
    * position, so a duplicate passage shifted by any offset inside its
    * document produces the same interior spans — the fidelity gap the
    * fixed grid of [[explodedSpans]] leaves (a <k-token offset
    * misaligns every grid span) closes to at most one partial span at
    * each edge of the duplicated region. This is winnowing-style
    * anchoring reduced to a per-token predicate, which keeps the oracle
    * computation engine-portable (`md5` is bit-identical everywhere).
    *
    * Scale shape: span construction is ROW-LOCAL — anchor positions,
    * sub-split boundaries and span texts are all array functions of the
    * document's own token array, so the spans materialize in a pure
    * projection with NO shuffle (r19; the first implementation exploded
    * every token to a row and pushed the corpus token-by-token through
    * a running-max window plus a (doc, segment, sub-span) aggregate —
    * two exchanges of token-granularity rows carrying their token
    * strings, guide §2.3/§2.4, and the per-doc state bound was the same
    * one this version gets for free from row-locality). The staged
    * arrays (`__a`, `__b`) are named columns, not chained expressions —
    * each is referenced more than once, and CollapseProject keeps
    * multiply-referenced non-cheap aliases in their own projection
    * (the mm_decode lesson).
    */
  private[graft] def anchoredSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    val toks = docs
      .select(
        col(idCol).as("__doc"),
        filter(split(col(textCol), " "), t => t =!= "").as("__t"))
      // empty/null-text docs contribute no spans (the explode below
      // emits nothing for them; the old posexplode_outer + isNotNull
      // filter had the same net effect)
      .where(size(col("__t")) > 0)
    val n = size(col("__t"))
    // anchor positions (0-based): position 0, plus every token whose md5
    // hex rendering starts with '0' — identical predicate, evaluated once
    // per token as before (just per array element instead of per row)
    val anchors = filter(sequence(lit(0), n - 1),
      i => (i === 0) ||
        (substring(md5(element_at(col("__t"), i + 1)), 1, 1) === "0"))
    // span boundaries: each anchor-free run [a_m, a_{m+1}) sub-splits
    // every k tokens FROM THE RUN'S START — sequence(a_m, a_{m+1}-1, k);
    // the final run ends at n. Boundaries stay globally ascending.
    def withNext(arr: Column, last: Column): Column =
      concat(slice(arr, lit(2), greatest(size(arr) - 1, lit(0))), array(last))
    val staged = toks.withColumn("__a", anchors)
    val bounds = flatten(zip_with(col("__a"), withNext(col("__a"), n),
      (s, e) => sequence(s, e - 1, lit(k))))
    val spans = staged.withColumn("__b", bounds)
      .select(col("__doc"), col("__t"),
        explode(zip_with(col("__b"), withNext(col("__b"), n),
          (s, e) => struct(s.as("__idx"),
            array_join(slice(col("__t"), s + 1, e - s), " ").as("__span")))).as("__sp"))
    spans.select(
      col("__doc"),
      col("__sp").getField("__idx").as("__idx"),
      col("__sp").getField("__span").as("__span"),
      xxhash64(col("__sp").getField("__span")).as("__sh"))
  }

  /** [[dedupSpans]] with the content-anchored spans of
    * [[anchoredSpans]]: exact substring dedup that still fires when the
    * duplicate passage sits at a different token offset in each
    * document. `spanTokens` caps span length inside anchor-free runs.
    */
  def dedupSpansAnchored(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int
  ): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1: $spanTokens")
    keepFirst(anchoredSpans(docs, idCol, textCol, spanTokens), idCol, textCol)
  }

  /** Surviving (__doc, __idx, __span) rows → (idCol, textCol) documents,
    * spans rejoined in order. One shuffle on doc id; per-doc state is
    * bounded by document length.
    */
  private[graft] def reassemble(kept: DataFrame, idCol: String, textCol: String): DataFrame =
    kept
      .groupBy(col("__doc"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__idx"), col("__span")))),
          s => s.getField("__span")),
        " ").as("__text"))
      .select(col("__doc").as(idCol), col("__text").as(textCol))

  /** Scrub variant: instead of keep-first, REMOVE every occurrence of a
    * span whose corpus-wide count exceeds `maxOccurrences` — the C4/
    * RefinedWeb treatment of boilerplate (navigation chrome, licence
    * text) where no occurrence is worth keeping. `maxOccurrences = 1`
    * removes all duplicated text outright.
    */
  def scrubFrequentSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int,
      maxOccurrences: Long
  ): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1: $spanTokens")
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1: $maxOccurrences")
    val exploded = explodedSpans(docs, idCol, textCol, spanTokens)
    val frequent = exploded
      .groupBy(col("__sh"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxOccurrences)
      .select(col("__sh"), lit(true).as("__drop"))
    reassemble(
      exploded
        .join(frequent, Seq("__sh"), "left_outer")
        .where(col("__drop").isNull),
      idCol, textCol)
  }
}
