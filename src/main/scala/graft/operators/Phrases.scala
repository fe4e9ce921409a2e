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
  * Scale shape: ONE corpus scan and ONE count shuffle — unigrams and
  * bigrams ride the same explode as a tagged union (a token can never
  * contain a space, a space-joined bigram always does, so the tag is
  * free) and the map-side-combined count collapses both per partition
  * before the exchange. The total token count comes from summing the
  * BOUNDED unigram frame (vocabulary-sized — 10^4-10^6 entries, not
  * corpus-sized), never from a second corpus pass, and the bigram frame
  * joins that same unigram table twice by broadcast. `minCount` prunes
  * the bigram tail BEFORE the joins — the word2phrase discard threshold.
  */
object Phrases {

  /** (w1, w2, n_pair, n_w1, n_w2, lift) for every adjacent token pair
    * occurring at least `minCount` times. Duplicate-preserving bigrams
    * (collocation counts need the multiset, not the distinct set).
    */
  def bigramLift(docs: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    require(minCount >= 1)
    // one pass: every document contributes its tokens AND its space-joined
    // adjacent pairs to a single exploded count. The counts frame is
    // localCheckpoint'ed (it is vocabulary + bigram-vocabulary sized, NOT
    // corpus-sized) so the corpus explode+shuffle runs exactly once even
    // though three consumers read it — and, unlike persist, its blocks
    // free on GC instead of leaking in the CacheManager (the Pack rule).
    val counts = docs
      .select(TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(explode(concat(col("__ts"), TextFunctions.tokenNgrams(col("__ts"), 2))).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val uni = counts.where(!col("g").contains(" "))
      .select(col("g").as("w"), col("n").as("n_w"))
    val nTotal = uni.select(sum(col("n_w"))).head.getLong(0)
    val pairs = counts.where(col("g").contains(" ") && col("n") >= minCount)
      .select(
        split_part(col("g"), lit(" "), lit(1)).as("w1"),
        split_part(col("g"), lit(" "), lit(2)).as("w2"),
        col("n").as("n_pair"))
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_w1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_w2"))), "w2")
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        round(col("n_pair").cast("double") * nTotal /
          (col("n_w1").cast("double") * col("n_w2")), 6).as("lift"))
  }
}
