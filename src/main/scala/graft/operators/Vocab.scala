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
    */
  def encodeColumn(text: Column, vocab: Map[String, Int]): Column = {
    val mapLit = typedlit(vocab)
    transform(TextFunctions.tokens(text),
      t => coalesce(element_at(mapLit, t), lit(-1)))
  }
}
