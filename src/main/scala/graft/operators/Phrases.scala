package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Phrase mining — collocation statistics over a tokenized corpus, the
  * word2phrase step that decides which adjacent word pairs ("new york",
  * "machine learning") should fuse into single tokens before vocabulary
  * construction.
  *
  * The score is the standard corpus-lift statistic
  * `lift(a,b) = count(ab) * N / (count(a) * count(b))` with `N` the
  * total unigram occurrence count: how much more often the pair occurs
  * than independence predicts (>1 = attraction). All counts are exact
  * integers; the products stay inside the double-exact 2^53 range for
  * any corpus this library certifies per-shard, and ONE final division
  * + round(6) makes the value cross-engine reproducible (the same
  * single-division discipline as [[UnigramModel]]).
  *
  * Scale shape: one explode+count shuffle for bigrams, one for unigrams
  * (both map-side combined — occurrence counts collapse per partition
  * before the exchange), then the bigram frame joins the BOUNDED unigram
  * table twice (vocabulary-sized, broadcast; a tokenizer vocabulary is
  * 10^4-10^6 entries, not corpus-sized). `minCount` prunes the bigram
  * tail BEFORE the joins — the word2phrase discard threshold.
  */
object Phrases {

  /** (w1, w2, n_pair, n_w1, n_w2, lift) for every adjacent token pair
    * occurring at least `minCount` times. Duplicate-preserving bigrams
    * (collocation counts need the multiset, not the distinct set).
    */
  def bigramLift(docs: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    require(minCount >= 1)
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("__ts"))
    val uni = toks
      .select(explode(col("__ts")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_w"))
    val nTotal = toks.select(sum(size(col("__ts")))).head.getLong(0)
    val pairs = toks
      .select(explode(TextFunctions.tokenNgrams(col("__ts"), 2)).as("__g"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
      .select(
        split_part(col("__g"), lit(" "), lit(1)).as("w1"),
        split_part(col("__g"), lit(" "), lit(2)).as("w2"),
        col("n_pair"))
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_w1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_w2"))), "w2")
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        round(col("n_pair").cast("double") * nTotal /
          (col("n_w1").cast("double") * col("n_w2")), 6).as("lift"))
  }
}
