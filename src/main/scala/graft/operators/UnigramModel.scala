package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Unigram-frequency document scoring — the cheap stand-in for the LM
  * perplexity filter of a CCNet-style pipeline: documents whose tokens
  * are rare under a corpus-wide unigram model score high (rarity),
  * out-of-vocabulary tokens are counted against a bounded top-V model.
  *
  * Determinism across engines is engineered in: each token contributes
  * INTEGER rarity points `totalTokens div count(token)` (exact integer
  * division; OOV tokens hit the floor count of 1, the maximum-rarity
  * convention), the per-document sum is an integer (order-independent —
  * no float summation-order hazard between engines), and a single
  * double division + round(6) happens at the very end.
  *
  * Scale: the model is `Vocab.build`'s top-V (bounded, broadcast as a
  * map literal); scoring is a pure projection over the staged token
  * array — the corpus never shuffles to be scored.
  */
object UnigramModel {

  /** (token -> count) for the top `size` tokens, plus the TOTAL token
    * occurrence count of the corpus (all tokens, not just the kept V —
    * so kept-token probabilities stay true when V truncates the tail).
    */
  def fit(docs: DataFrame, textCol: String, size: Int): (Map[String, Long], Long) = {
    val vocab = Vocab.build(docs, textCol, size)
      .select(col("token"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs
      .select(size_of(TextFunctions.tokens(col(textCol))).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    (vocab, total)
  }

  private def size_of(c: Column): Column = size(c)

  /** Integer rarity points of one token array under the model: sum over
    * tokens of `total div count(token)` (OOV count = 1). Exact integer
    * arithmetic, order-independent.
    */
  def rarityPoints(ts: Column, model: Map[String, Long], total: Long): Column = {
    val mapLit = typedlit(model)
    aggregate(
      transform(ts, t => {
        val cnt = coalesce(element_at(mapLit, t), lit(1L))
        // exact integer division in the Column DSL: subtract the
        // remainder first so the double division is exact
        ((lit(total) - pmod(lit(total), cnt)) / cnt).cast("long")
      }),
      lit(0L), (acc, x) => acc + x)
  }

  /** Per-document rarity statistics: (idCol, n_tokens, oov_rate,
    * mean_rarity), both rates rounded to 6dp after the single final
    * division.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Map[String, Long],
      total: Long
  ): DataFrame = {
    val mapLit = typedlit(model)
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"),
        rarityPoints(col("__ts"), model, total).as("__pts"),
        aggregate(transform(col("__ts"),
          t => when(element_at(mapLit, t).isNull, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("__oov"))
      .select(col(idCol),
        size(col("__ts")).as("n_tokens"),
        when(size(col("__ts")) === 0, lit(0.0))
          .otherwise(round(col("__oov").cast("double") / size(col("__ts")), 6)).as("oov_rate"),
        when(size(col("__ts")) === 0, lit(0.0))
          .otherwise(round(col("__pts").cast("double") / size(col("__ts")), 6)).as("mean_rarity"))
  }

  /** [[score]] for a model too large to inline as a map literal (a real
    * top-100k unigram table): explode tokens → BROADCAST hash join
    * against the (token, cnt) model — O(1) hash probes instead of the
    * literal map's linear key scan, and no megabyte literal in the
    * expression tree — then re-aggregate per document. The rarity sum is
    * order-independent INTEGER arithmetic, so this path is value-exact
    * with [[score]] (same points, same single final division); it pays
    * one map-side-combined shuffle of (doc, three longs) for the
    * re-aggregation. Below `literalThreshold` it simply delegates to the
    * projection path.
    */
  def scoreLarge(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      modelDf: DataFrame, // (token, cnt)
      total: Long,
      literalThreshold: Int = 4096
  ): DataFrame = {
    if (modelDf.count() <= literalThreshold) {
      val m = modelDf.select(col("token"), col("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      return score(docs, idCol, textCol, m, total)
    }
    // spread before the tokenize+explode map side (r18, batch-only)
    val toks = Spread.small(docs).select(
      col(idCol), explode_outer(TextFunctions.tokens(col(textCol))).as("__tok"))
    val cnt = coalesce(col("__cnt"), lit(1L))
    toks
      .join(broadcast(modelDf.select(col("token").as("__tok"), col("cnt").as("__cnt"))),
        Seq("__tok"), "left")
      // empty documents survive the outer explode as one null-token row:
      // count(__tok) ignores it, so n_tokens lands at 0
      .groupBy(col(idCol))
      .agg(
        count(col("__tok")).cast("int").as("n_tokens"),
        sum(when(col("__tok").isNotNull,
          ((lit(total) - pmod(lit(total), cnt)) / cnt).cast("long")).otherwise(0L)).as("__pts"),
        sum(when(col("__tok").isNotNull && col("__cnt").isNull, 1L).otherwise(0L)).as("__oov"))
      .select(col(idCol),
        col("n_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("__oov").cast("double") / col("n_tokens"), 6)).as("oov_rate"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("__pts").cast("double") / col("n_tokens"), 6)).as("mean_rarity"))
  }
}
