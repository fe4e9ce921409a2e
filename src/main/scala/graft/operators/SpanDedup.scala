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
    val k = spanTokens
    // Stage the token array in its own projection; the span lambda
    // below references it per element and must not re-split per span.
    val toks = docs.select(
      col(idCol).as("__doc"),
      split(col(textCol), " ").as("__t"))
    val nSpans = ceil(size(col("__t")).cast("double") / lit(k.toDouble)).cast("int")
    val staged = toks.select(
      col("__doc"),
      when(size(col("__t")) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), nSpans - 1),
          i => array_join(slice(col("__t"), i * k + 1, lit(k)), " ")))
        .as("__spans"))
    // Generator in its own select (a generator sharing a projection
    // with lambda-built structs strips struct field names).
    val exploded = staged
      .select(col("__doc"), posexplode(col("__spans")).as(Seq("__idx", "__span")))
      .withColumn("__sh", xxhash64(col("__span")))
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
    kept
      .groupBy(col("__doc"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__idx"), col("__span")))),
          s => s.getField("__span")),
        " ").as("__text"))
      .select(col("__doc").as(idCol), col("__text").as(textCol))
  }

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
    val k = spanTokens
    val toks = docs.select(
      col(idCol).as("__doc"),
      split(col(textCol), " ").as("__t"))
    val nSpans = ceil(size(col("__t")).cast("double") / lit(k.toDouble)).cast("int")
    val staged = toks.select(
      col("__doc"),
      when(size(col("__t")) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), nSpans - 1),
          i => array_join(slice(col("__t"), i * k + 1, lit(k)), " ")))
        .as("__spans"))
    val exploded = staged
      .select(col("__doc"), posexplode(col("__spans")).as(Seq("__idx", "__span")))
      .withColumn("__sh", xxhash64(col("__span")))
    val frequent = exploded
      .groupBy(col("__sh"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxOccurrences)
      .select(col("__sh"), lit(true).as("__drop"))
    exploded
      .join(frequent, Seq("__sh"), "left_outer")
      .where(col("__drop").isNull)
      .groupBy(col("__doc"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__idx"), col("__span")))),
          s => s.getField("__span")),
        " ").as("__text"))
      .select(col("__doc").as(idCol), col("__text").as(textCol))
  }
}
