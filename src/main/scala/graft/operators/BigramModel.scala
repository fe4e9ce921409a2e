package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bigram language-model document scoring — the CCNet-shaped quality
  * filter: fit a bigram LM on a REFERENCE slice (CCNet fits KenLM on
  * Wikipedia), score every document by how surprising its adjacent
  * token pairs are under that model, and filter/stratify the corpus on
  * the score. Extends [[UnigramModel]]'s rarity family one conditioning
  * token deeper: a document of individually common but never-adjacent
  * tokens ("the of and is") scores unremarkably under a unigram model
  * and loudly here.
  *
  * Determinism discipline (same as [[UnigramModel]]/[[Phrases]]): each
  * bigram contributes INTEGER inverse-probability points —
  * `n(w1) div n(w1 w2)` when the model saw the pair (the integer 1/P of
  * the conditional), `backoffMult * (total div n(w2))` when it didn't
  * (a penalized unigram backoff, OOV floor count 1) — summed in exact
  * integer arithmetic (order-independent), with ONE double division +
  * round(6) per output column at the end.
  *
  * Scale shape: the model is two count tables built in ONE corpus scan
  * ([[Phrases]]' tagged-union explode — a token never contains a space,
  * a joined bigram always does); they are vocabulary-sized, not
  * corpus-sized, and stay DISTRIBUTED (a web-corpus bigram table is
  * 10^8-10^9 rows — never a driver map, never a Catalyst literal).
  * Scoring explodes each document's bigrams and hash-joins the model
  * tables on token keys; AQE broadcasts them when they fit, and the
  * per-document aggregate map-combines before its shuffle. Documents
  * with fewer than two tokens have no bigrams and drop out.
  */
object BigramModel {

  /** A fitted bigram LM: `uni` = (g: token, n), `bi` = (g: "w1 w2", n),
    * `totalTokens` = corpus token occurrences. Both frames are
    * localCheckpoint'ed by [[fit]] so reuse across scorings never
    * re-scans the fit corpus, and their blocks free on GC.
    */
  final case class Lm(uni: DataFrame, bi: DataFrame, totalTokens: Long)

  /** Fit unigram AND bigram counts in one scan of `docs` — the
    * reference-corpus pass. No minimum count: the scoring join prunes
    * nothing the backoff would not have to re-derive.
    */
  def fit(docs: DataFrame, textCol: String): Lm = {
    val counts = Spread.small(docs)
      .select(TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(explode(concat(col("__ts"), TextFunctions.tokenNgrams(col("__ts"), 2))).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val uni = counts.where(!col("g").contains(" "))
    val bi = counts.where(col("g").contains(" "))
    val total = uni.agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    Lm(uni, bi, total)
  }

  /** Exact integer `a div b` in the Column DSL (subtract the remainder
    * before the double division so the result is exact at any Long).
    */
  private def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Per-document surprise under `lm`: (idCol, n_bigrams, unseen_rate,
    * mean_points). Higher mean = less like the reference corpus — the
    * quality-filter axis. `backoffMult` is the integer penalty factor
    * for bigrams the model never saw.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: Lm,
      backoffMult: Long = 2L
  ): DataFrame = {
    require(backoffMult >= 1, s"backoffMult must be >= 1: $backoffMult")
    // spread before the explode+join map side (r18): a one-split corpus
    // otherwise scores on a single task (batch-only entry point)
    val bgs = Spread.small(docs)
      .select(col(idCol).as("__doc"), TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(col("__doc"), explode(TextFunctions.tokenNgrams(col("__ts"), 2)).as("__bg"))
      .withColumn("__w1", split_part(col("__bg"), lit(" "), lit(1)))
      .withColumn("__w2", split_part(col("__bg"), lit(" "), lit(2)))
    val seen = lm.bi.select(col("g").as("__bg"), col("n").as("__nbg"))
    val w1c = lm.uni.select(col("g").as("__w1"), col("n").as("__nw1"))
    val w2c = lm.uni.select(col("g").as("__w2"), col("n").as("__nw2"))
    bgs
      .join(seen, Seq("__bg"), "left_outer")
      .join(w1c, Seq("__w1"), "left_outer")
      .join(w2c, Seq("__w2"), "left_outer")
      .withColumn("__pts",
        when(col("__nbg").isNotNull, intDiv(col("__nw1"), col("__nbg")))
          .otherwise(lit(backoffMult) *
            intDiv(lit(lm.totalTokens), coalesce(col("__nw2"), lit(1L)))))
      .groupBy(col("__doc"))
      .agg(
        count(lit(1)).as("__n"),
        sum(when(col("__nbg").isNull, lit(1L)).otherwise(lit(0L))).as("__unseen"),
        sum(col("__pts")).as("__sum"))
      .select(
        col("__doc").as(idCol),
        col("__n").as("n_bigrams"),
        round(col("__unseen").cast("double") / col("__n"), 6).as("unseen_rate"),
        round(col("__sum").cast("double") / col("__n"), 6).as("mean_points"))
  }
}
