package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** Similarity search over embedding columns (`Array[Float]`), designed
  * for the 100 TB shape: queries broadcast, corpus scanned once, top-k
  * reduced with a bounded partial aggregate (map-side top-k per
  * partition, then a k-list merge) — the full query×corpus pair set is
  * never shuffled.
  */
object Similarity {

  /** Sequential left-to-right dot product — same evaluation order as a
    * SQL engine's list fold, so double-precision results are
    * bit-comparable across engines. Native compiled loop
    * ([[graft.functions.DotProduct]]): interpreted `aggregate(zip_with)`
    * lambdas cost ~700ns/element and this runs |corpus|×|queries| times.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.functions.DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-12))

  /** Bounded top-k aggregator: buffer never exceeds 2k entries, partial
    * aggregation runs map-side, merge is a k-list merge. IN/BUF/OUT are
    * (sim, id) pairs ordered by (-sim, id) for deterministic ties.
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def top(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (sim, id) => (-sim, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Nil
    override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
      val appended = buf :+ in
      if (appended.size > 2 * k) top(appended) else appended
    }
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      top(a ++ b)
    override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = top(buf)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Brute-force cosine top-k: every query (small set, broadcast) against
    * every corpus vector, reduced per query with the bounded top-k
    * aggregate. Output: (qid, nid, rank, sim) with rank 1..k,
    * deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val c = corpus.select(
      col(idCol).as("nid"),
      transform(col(vecCol), x => x.cast("double")).as("cvec")
    )
    val q = queries.select(
      col(idCol).as("qid"),
      transform(col(vecCol), x => x.cast("double")).as("qvec")
    )
    val scored = c
      .crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("cvec")).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Reduce (qid, nid, sim) rows to per-query top-k using the bounded
    * aggregator (map-side partial top-k; never shuffles all pairs).
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    scored
      .groupBy(col("qid"))
      .agg(topk(col("sim"), col("nid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("r", "pair")))
      .select(
        col("qid"),
        col("pair._2").as("nid"),
        (col("r") + 1).as("rank"),
        round(col("pair._1"), 6).as("sim")
      )
  }

  /** IVF-style ANN: corpus vectors are bucketed by nearest centroid;
    * each query probes only its `nProbe` closest centroid buckets, so
    * the scan touches ~nProbe/nCentroids of the corpus. Centroids here
    * are a deterministic sample of the corpus (the first `nCentroids`
    * ids) — a production pipeline would run k-means iterations, which
    * only changes how the centroid table is produced, not the query
    * plan shape (bucket join + bounded top-k).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val c = corpus.select(
      col(idCol).as("nid"),
      transform(col(vecCol), x => x.cast("double")).as("cvec")
    )
    // deterministic "training": lowest-id vectors are the centroids
    val centroids = c.orderBy(col("nid")).limit(nCentroids).collect().map { r =>
      r.getSeq[Double](1)
    }.toSeq
    val centLit = typedlit(centroids)
    def nearestBuckets(vec: Column, n: Int): Column =
      slice(
        transform(
          array_sort(
            zip_with(
              transform(centLit, cv => dot(vec, cv) / greatest(norm(vec) * norm(cv), lit(1e-12))),
              sequence(lit(0), lit(nCentroids - 1)),
              (sim, idx) => struct((-sim).as("neg"), idx.as("idx"))
            )
          ),
          s => s.getField("idx")
        ),
        1, n
      )
    val bucketed = c.withColumn("bucket", nearestBuckets(col("cvec"), 1).getItem(0))
    val q = queries.select(
      col(idCol).as("qid"),
      transform(col(vecCol), x => x.cast("double")).as("qvec")
    )
    val probes = q.select(
      col("qid"), col("qvec"),
      explode(nearestBuckets(col("qvec"), nProbe)).as("bucket")
    )
    val scored = bucketed
      .join(broadcast(probes), "bucket")
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("cvec")).as("sim"))
    topKPerQuery(scored, k)
  }
}
