package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Vocabulary construction + corpus encoding — the tokenizer-training
  * step of an LLM data pipeline: count tokens across the corpus, keep the
  * top `size` by frequency (deterministic ties: lexicographic), assign
  * contiguous ids 0..V-1 in rank order, then map documents to id
  * sequences.
  *
  * Scale shape: counting is one map-side-combined shuffle of (token,
  * partial count) — never raw token occurrences; the top-V cut is
  * orderBy+limit (TakeOrdered: only per-partition top lists reach the
  * driver-side merge); the ONLY global window runs over the V-row vocab
  * itself, which is bounded by construction (a tokenizer vocab is 10^4-10^5
  * entries, not corpus-sized). Encoding is a pure projection through a
  * broadcast token→id map literal — out-of-vocabulary tokens become -1,
  * the corpus never shuffles.
  */
object Vocab {

  /** (token, cnt, id) for the `size` most frequent tokens with at least
    * `minCount` occurrences; id 0 is the most frequent.
    */
  def build(docs: DataFrame, textCol: String, size: Int, minCount: Long = 1L): DataFrame = {
    require(size >= 1 && minCount >= 1)
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    counts
      .orderBy(desc("cnt"), col("token"))
      .limit(size)
      .withColumn("id",
        (row_number().over(Window.orderBy(desc("cnt"), col("token"))) - 1).cast("int"))
  }

  /** Token→id map of a built vocab, collected to the driver (V rows) for
    * broadcast into [[encodeColumn]].
    */
  def toMap(vocab: DataFrame): Map[String, Int] =
    vocab.select(col("token"), col("id")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

  /** Encode a text column to its id sequence through the vocab map
    * (OOV → -1). Pure projection against a map literal — no join, no
    * shuffle; the staging rule applies (tokens computed once here, the
    * lambda only probes the map).
    *
    * SMALL-VOCAB path only: the map is embedded in the expression tree,
    * so a real tokenizer vocab (32k-100k entries) would push a
    * megabyte-scale literal through codegen and every task binary — and
    * Catalyst map lookups scan keys linearly, so probe cost grows with V
    * too. Use [[encode]] for anything bigger than a few thousand entries;
    * it switches to a broadcast hash join (true O(1) probes) above
    * `literalThreshold`.
    */
  def encodeColumn(text: Column, vocab: Map[String, Int]): Column = {
    val mapLit = typedlit(vocab)
    transform(TextFunctions.tokens(text),
      t => coalesce(element_at(mapLit, t), lit(-1)))
  }

  /** Encode `textCol` of every document into an `ids` sequence (OOV → -1),
    * choosing the plan by vocab size:
    *
    *  - V <= `literalThreshold`: [[encodeColumn]]'s map-literal projection —
    *    zero shuffle, the corpus never moves.
    *  - V > `literalThreshold`: positional explode → BROADCAST hash join on
    *    the token (an O(1) hash probe per occurrence, vs the literal map's
    *    linear key scan, and no giant literal in the expression tree /
    *    codegen) → re-assemble each document by sorting its (position, id)
    *    pairs. This path pays ONE shuffle of (doc, pos, id) triples for the
    *    re-aggregation — the standard price of joining against a vocab too
    *    big to inline; the vocab side stays broadcast so the corpus is
    *    never hashed against a shuffled build side.
    *
    * Returns (idCol, ids). Documents with no tokens encode to [].
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      literalThreshold: Int = 4096
  ): DataFrame = {
    val v = vocab.count()
    if (v <= literalThreshold) {
      docs.select(col(idCol), encodeColumn(col(textCol), toMap(vocab)).as("ids"))
    } else {
      val toks = docs.select(
        col(idCol),
        posexplode_outer(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "__tok")))
      toks
        .join(broadcast(vocab.select(col("token").as("__tok"), col("id").as("__vid"))),
          Seq("__tok"), "left")
        // empty documents survive the outer explode as a null-position row;
        // collect_list drops the null struct below, yielding ids = []
        .groupBy(col(idCol))
        .agg(sort_array(collect_list(when(col("__pos").isNotNull,
          struct(col("__pos"), coalesce(col("__vid"), lit(-1)).as("__id"))))).as("__pi"))
        .select(col(idCol), transform(col("__pi"), x => x.getField("__id")).as("ids"))
    }
  }
}
