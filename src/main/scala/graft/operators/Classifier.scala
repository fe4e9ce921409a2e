package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frozen-model quality-classifier inference — the filtering step a
  * training-data pipeline runs after heuristic quality scores
  * ([[graft.functions.TextFunctions.qualityScore]]): a linear model over
  * hashed bag-of-token features (the fastText / Vowpal-Wabbit hashing
  * trick), applied at corpus scale with the model frozen.
  *
  * Two execution plans, same result by construction (both oracle-gated
  * against one SQL truth, the vocab-encode discipline):
  *
  *  - [[classify]]: score as a PURE PROJECTION — tokens fold through a
  *    codegen'd `aggregate`, each token hashing to a bucket whose weight
  *    is an expression of the bucket id. ZERO shuffles: the only plan
  *    over a 100 TB corpus is scan → project → (filter). This is the
  *    shape when the weight vector is compact enough to express inline
  *    (or compiled into a native expression).
  *  - [[classifyJoin]]: weights as a TABLE (bucket → weight) — the shape
  *    for learned, vocabulary-scale weight vectors that do not belong in
  *    the plan (the IVF-centroid lesson: no multi-MB plan literals).
  *    Tokens explode, broadcast-join the weight table, re-aggregate per
  *    document: ONE shuffle, map-side combined, corpus never broadcast.
  *
  * Integer weights keep scores exact (sum order never matters). Float
  * weights are first-class on the PROJECTION path: the fold is strictly
  * sequential in token order, so scores are bit-reproducible across
  * engines that replicate the association (see the Column-typed
  * [[classify]] overload; gate `doc_classifier_float`). On the JOIN
  * path float sums are only exact when the weights live on a dyadic
  * grid (k/2^m): the re-aggregate's addition order is
  * partition-nondeterministic, and dyadic terms are the regime where
  * every partial sum is exact so order cannot matter.
  */
object Classifier {

  /** Feature bucket of a token: top-8-hex of md5 mod `dims` —
    * engine-replicable (DuckDB: `('0x' || substr(md5(t), 1, 8))::BIGINT %
    * dims`), uniform, and cheap (one md5 per token, the same primitive
    * every md5-keyed operator here uses).
    */
  def featureBucket(token: Column, dims: Int): Column =
    conv(substring(md5(token.cast("binary")), 1, 8), 16, 10).cast("long") % dims

  /** Σ weightOf(bucket(token)) + init over the document's tokens, as a
    * single codegen'd fold — no explode, no shuffle, no UDF. NULL text
    * scores the bare init, matching [[classifyJoin]] and the oracle
    * (a NULL token array would otherwise propagate a NULL score).
    */
  def scoreCol(text: Column, dims: Int, weightOf: Column => Column, init: Column): Column =
    aggregate(coalesce(TextFunctions.tokens(text), array().cast("array<string>")), init,
      (acc, t) => acc + weightOf(featureBucket(t, dims)))

  /** Projection-path inference: (id, score, keep). `keep` is
    * `score >= threshold` — the corpus filter a pipeline composes with
    * dedup/decontamination gates.
    */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      weightOf: Column => Column,
      bias: Long = 0L,
      threshold: Long = 0L
  ): DataFrame =
    classify(docs, idCol, textCol, dims, weightOf, lit(bias), lit(threshold))

  /** Column-typed bias/threshold overload — the FLOAT-weight path. Exact
    * cross-engine reproducibility holds when each per-token weight is
    * built from exactly-rounded IEEE ops (sqrt/mul/div/add of exact
    * inputs) and the consumer replicates the fold's association order:
    * [[scoreCol]] folds `((bias + w1) + w2) + ...` strictly left-to-right
    * in token order — per-row sequential, never shuffled — so an engine
    * summing the same weights in the same order reproduces every bit
    * (the `doc_classifier_float` gate hash-matches DuckDB this way,
    * `list_prepend(bias, weights)` then a left-to-right list sum).
    */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      weightOf: Column => Column,
      bias: Column,
      threshold: Column
  ): DataFrame =
    docs
      .select(col(idCol), scoreCol(col(textCol), dims, weightOf, bias).as("score"))
      .withColumn("keep", col("score") >= threshold)

  /** Weight-table inference: same contract as [[classify]], weights read
    * from `weights(bucketCol, weightCol)` — broadcast when it fits (a
    * 2^20-bucket int-weight table is ~16 MB; Spark's auto-broadcast or
    * the explicit hint below covers it), LEFT join so out-of-table
    * buckets weigh 0 and tokenless documents keep `score = bias`,
    * exactly like the projection path.
    *
    * Requires `idCol` to be unique: the re-aggregate groups by it, so
    * duplicate ids would merge into one summed row where [[classify]]
    * (a per-row projection) scores each copy separately.
    */
  def classifyJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      weights: DataFrame,
      bucketCol: String,
      weightCol: String,
      bias: Long = 0L,
      threshold: Long = 0L
  ): DataFrame =
    classifyJoin(docs, idCol, textCol, dims, weights, bucketCol, weightCol,
      lit(bias), lit(threshold))

  /** Column-typed bias/threshold overload of [[classifyJoin]]. With
    * FLOAT weights, keep them on a dyadic grid (k/2^m with bounded k):
    * the aggregate's addition order is partition-nondeterministic, and
    * dyadic terms whose partial sums stay exact are the regime where
    * order provably cannot change the result (gate
    * `doc_classifier_float_join`). For ARBITRARY learned floats on the
    * join plan, use [[classifyJoinQuantized]].
    */
  def classifyJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      weights: DataFrame,
      bucketCol: String,
      weightCol: String,
      bias: Column,
      threshold: Column
  ): DataFrame =
    docs
      .select(col(idCol), explode_outer(TextFunctions.tokens(col(textCol))).as("__t"))
      .withColumn("__b", featureBucket(col("__t"), dims))
      .join(
        broadcast(weights.select(col(bucketCol).as("__b"), col(weightCol).as("__w"))),
        Seq("__b"), "left_outer")
      .groupBy(col(idCol))
      // type-generic zero: a tokenless/out-of-table document's NULL sum
      // falls back to the bare bias, in the weight column's own type
      .agg(coalesce(sum(col("__w")) + bias, bias).as("score"))
      .withColumn("keep", col("score") >= threshold)

  /** FIXED-POINT weight-table inference — the broadcast-join plan for
    * ARBITRARY learned float weights (VERDICT r16 #5). [[classifyJoin]]
    * with floats is only order-independent on a dyadic grid because the
    * re-aggregate's addition order is partition-nondeterministic; this
    * variant quantizes each weight ONCE on the (small) weight table —
    * `q(w) = floor(w·2^scaleBits + 0.5)` — sums the quantized LONGS
    * (integer addition is associative: any partition order yields the
    * same sum, bit for bit), and descales the total:
    * `score = (Σq + q(bias)) / 2^scaleBits`.
    *
    * Exactness contract: the descale is exact IEEE division by a power
    * of two, and the long→double conversion is exact while
    * `|Σq| < 2^53` — with `|w| ≤ W` that is ~2^(53-scaleBits)/W tokens
    * per document (≈8M at the default 30 bits, W=1), far past any real
    * document. The quantization step (2^-scaleBits ≈ 1e-9 at the
    * default) is the defined model semantic, not an error term: an
    * engine replicating `floor(w·2^b + 0.5)` on the same IEEE doubles
    * reproduces every score bit (gate `doc_classifier_fixed_join`
    * hash-matches DuckDB with non-dyadic weights). Same output contract
    * as [[classify]]: (id, score, keep), tokenless/out-of-table
    * documents score the bare bias.
    */
  def classifyJoinQuantized(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      weights: DataFrame,
      bucketCol: String,
      weightCol: String,
      bias: Double = 0.0,
      threshold: Double = 0.0,
      scaleBits: Int = 30
  ): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 52, s"scaleBits must be in [1, 52], got $scaleBits")
    val scale = math.pow(2.0, scaleBits) // exact: a power of two
    val qBias = math.floor(bias * scale + 0.5).toLong
    val qWeights = weights.select(
      col(bucketCol).as("__b"),
      floor(col(weightCol).cast("double") * lit(scale) + lit(0.5)).as("__wq"))
    docs
      .select(col(idCol), explode_outer(TextFunctions.tokens(col(textCol))).as("__t"))
      .withColumn("__b", featureBucket(col("__t"), dims))
      .join(broadcast(qWeights), Seq("__b"), "left_outer")
      .groupBy(col(idCol))
      .agg(((coalesce(sum(col("__wq")), lit(0L)) + lit(qBias)).cast("double") / lit(scale))
        .as("score"))
      .withColumn("keep", col("score") >= lit(threshold))
  }
}
