package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Exact term-based document retrieval — the inverted-index scoring step
  * a corpus pipeline uses to pull query-relevant documents (benchmark
  * neighborhoods, topic slices, eval-adjacent training data) out of a
  * web-scale corpus.
  *
  * Scoring is the BM25 FAMILY's df-weighted shape with deliberately
  * integer-exact arithmetic (the same determinism contract as
  * [[UnigramModel]]): a document scores
  * `sum over query terms t of tf(t, doc) * (N div df(t))` — term
  * frequency weighted by inverse document frequency, where `N div df`
  * is exact integer division (rare terms weigh more; a term in every
  * document weighs 1). No logs, no floats: the score is an
  * order-independent integer sum, bit-identical in any engine.
  *
  * Scale shape: the corpus is scanned ONCE; tokens are filtered to the
  * query's terms BEFORE anything shuffles (the explode emits only
  * matching occurrences — for a k-term query that is a k-term posting
  * list, not the corpus), then one map-side-combined aggregation builds
  * tf per (doc, term), df falls out of that same small frame, and the
  * final top-k is TakeOrdered (per-partition heads, only k-lists reach
  * the driver-side merge). Nothing corpus-sized ever shuffles or
  * broadcasts.
  */
object Retrieval {

  /** Top `topK` documents for `query` by integer df-weighted term score:
    * (idCol, score), score descending, ties by id ascending. Documents
    * sharing no term with the query never appear (score 0 rows are not
    * emitted — the posting-list contract).
    *
    * `corpusSize` injects a known document count N (from
    * [[Stats.tableStats]] / catalog statistics) so repeated queries skip
    * the count scan; left None, one count() pass computes it.
    */
  def termSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      topK: Int,
      corpusSize: Option[Long] = None
  ): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    require(topK >= 1)
    val n = corpusSize.getOrElse(docs.count())
    val terms = query.map(_.toLowerCase).distinct
    val hits = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .where(col("__t").isInCollection(terms))
    // localCheckpoint: tf feeds both df and the final join — without it
    // the lazy plan scans and re-tokenizes the CORPUS twice. The frame is
    // posting-list sized ((doc, term, count) triples for matching docs
    // only), far smaller than a second pass over the text; blocks free on
    // GC, unlike a CacheManager persist.
    val tf = hits.groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
      .localCheckpoint()
    // df per term: tf already holds one row per (doc, term), so the
    // distinct-doc count is a plain count over that small frame
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // exact integer division N div df via the remainder-subtraction trick
    // (the double division is exact because the numerator is divisible)
    val idf = ((lit(n) - pmod(lit(n), col("__df"))) / col("__df")).cast("long")
    tf.join(broadcast(dfreq), "__t")
      .groupBy(col(idCol))
      .agg(sum(col("__tf") * idf).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }
}
