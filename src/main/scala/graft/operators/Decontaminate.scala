package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Benchmark decontamination: flag (or drop) training documents that share
  * token n-grams with an evaluation/benchmark set — the standard guard
  * against test-set leakage when assembling a training corpus (13-gram
  * overlap is the published convention).
  *
  * Shape for 100 TB: the benchmark side is an eval suite — thousands of
  * documents, millions of n-grams at most — so its DISTINCT gram set is
  * BROADCAST and the training corpus is probed map-side: no shuffle of
  * corpus bytes, one scan, partial counts per doc. The train side's grams
  * are generated and matched inside a single projection+join stage; only
  * (doc_id, n_matched) for flagged docs ever leaves the scan stage. With
  * `broadcastBenchmark = false` the same plan degrades to a shuffle join
  * for benchmark sets too large to broadcast.
  *
  * Tokenization is deliberately minimal and engine-replicable (lowercase,
  * split on runs of non-alphanumerics, drop empties) so an external system
  * can reproduce membership decisions bit-for-bit.
  */
object Decontaminate {

  /** Lowercased alphanumeric tokens of `text`, in order, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** DISTINCT space-joined `n`-grams over an ALREADY-MATERIALIZED token
    * array column (empty when fewer than `n` tokens). Distinct because
    * contamination counts shared grams, not shared occurrences.
    *
    * Callers must stage [[tokens]] into its own projection first (as
    * [[contaminated]] does): inlining the tokenizer here would place it
    * inside the transform lambda, and Catalyst re-evaluates a lambda-body
    * subexpression per element — re-splitting the document once per gram
    * position, an O(len x positions) blowup.
    */
  def ngramsOfTokens(ts: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    array_distinct(
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - n + 1),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** One-shot [[tokens]] + [[ngramsOfTokens]] for ad-hoc use. Prefer the
    * staged pair in anything performance-sensitive (see ngramsOfTokens).
    */
  def ngramSet(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  private def explodedGrams(df: DataFrame, textCol: String, n: Int, keep: Seq[Column]): DataFrame =
    df.select(keep :+ tokens(col(textCol)).as("__ts"): _*)
      .select(keep :+ explode(ngramsOfTokens(col("__ts"), n)).as("__gram"): _*)

  /** Training documents sharing at least `minMatches` distinct token
    * `n`-grams with any benchmark document: (idCol, n_matched), where
    * n_matched counts the DISTINCT shared grams.
    */
  def contaminated(
      train: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13,
      minMatches: Int = 1,
      broadcastBenchmark: Boolean = true
  ): DataFrame = {
    val benchGrams0 = explodedGrams(benchmark, benchTextCol, n, Nil).distinct()
    val benchGrams = if (broadcastBenchmark) broadcast(benchGrams0) else benchGrams0
    // corpus-side gram hashing is the heavy map stage — spread a
    // one-split input before it (Spread.small: stats-gated, no-op at scale)
    explodedGrams(Spread.small(train), textCol, n, Seq(col(idCol)))
      .join(benchGrams, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"))
      .where(col("n_matched") >= minMatches)
  }

  /** The training corpus with contaminated documents removed (left-anti
    * join against [[contaminated]]).
    *
    * `broadcastFlagged` mirrors `broadcastBenchmark` for the SECOND join:
    * with a clean corpus the flagged-id set is tiny and broadcasting it
    * keeps the corpus from shuffling for the anti join — but on a heavily
    * contaminated corpus the flagged set is corpus-sized, and forcing a
    * broadcast there would collect it to the driver. Set it false to let
    * the anti join degrade to a shuffle join (or leave Spark's own
    * threshold-based auto-broadcast to decide from statistics).
    */
  def decontaminate(
      train: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 13,
      minMatches: Int = 1,
      broadcastBenchmark: Boolean = true,
      broadcastFlagged: Boolean = true
  ): DataFrame = {
    val flagged0 =
      contaminated(train, idCol, textCol, benchmark, benchTextCol, n, minMatches, broadcastBenchmark)
        .select(col(idCol))
    val flagged = if (broadcastFlagged) broadcast(flagged0) else flagged0
    train.join(flagged, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------------
  // Semantic (embedding-space) decontamination
  // ---------------------------------------------------------------------

  /** Training documents whose embedding sits within cosine `threshold` of
    * ANY benchmark embedding: (idCol, n_matched, max_cosine). The
    * embedding-space counterpart of [[contaminated]] — n-gram overlap
    * misses paraphrased or translated test-set leakage; cosine over a
    * shared embedding model catches it.
    *
    * Shape for 100 TB: same argument as the n-gram path — an eval suite
    * is thousands of vectors, so the benchmark side is BROADCAST and the
    * corpus is probed map-side in one scan with a codegen'd dot product
    * ([[Similarity.cosine]] compiles to a tight loop, not an interpreted
    * lambda). The join is a BroadcastNestedLoopJoin by construction
    * (cosine is not an equi-condition); cost is |corpus| x |benchmark|
    * cosine evaluations with nothing but flagged (id, sim) rows leaving
    * the scan stage — exact, shuffle-free on the corpus side, and
    * embarrassingly parallel. For benchmark sets too large to broadcast,
    * use [[semanticContaminatedIvf]], which buckets both sides by
    * coarse centroid so each corpus row is scored only against the
    * benchmark vectors probing its bucket.
    */
  def semanticContaminated(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double,
      broadcastBenchmark: Boolean = true,
      maxBroadcastBytes: Long = DefaultMaxBroadcastBytes
  ): DataFrame = {
    if (broadcastBenchmark && !benchmarkBroadcastable(benchmark, benchVecCol, maxBroadcastBytes)) {
      // safety valve: above the broadcast budget the exact
      // BroadcastNestedLoopJoin plan would either OOM the driver or
      // degrade to an all-pairs shuffle — fail over to the IVF-bucketed
      // path (approximate; recall pinned by the
      // doc_semantic_decontam_ivf_recall gate) instead of planning an
      // unbounded broadcast. Callers needing exactness above the budget
      // must pre-shard the benchmark side themselves. The fallback is
      // LOUD (ADVICE r13): callers of an exact-documented API must see
      // that they are getting recall<1 results.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semanticContaminated: benchmark exceeds the $maxBroadcastBytes-byte broadcast budget — " +
          "falling back to the APPROXIMATE IVF-bucketed path (recall<1). Pre-shard the benchmark " +
          "or raise maxBroadcastBytes for exact results.")
      return semanticContaminatedIvf(
        train, idCol, vecCol, benchmark, benchVecCol, threshold)
    }
    val bench0 = benchmark.select(
      transform(col(benchVecCol), x => x.cast("double")).as("__bvec"))
    val bench = if (broadcastBenchmark) broadcast(bench0) else bench0
    val sim = Similarity.cosine(col("__tvec"), col("__bvec"))
    train
      .select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("__tvec"))
      .join(bench, sim >= threshold)
      .select(col(idCol), sim.as("__sim"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), max(col("__sim")).as("max_cosine"))
  }

  /** Broadcast budget for the benchmark side of the exact semantic
    * paths: ~256 MB of packed vector doubles — far below Spark's 8 GB
    * broadcast hard cap but big enough for any real eval suite (e.g.
    * 30k vectors at dim 1024).
    */
  val DefaultMaxBroadcastBytes: Long = 256L << 20

  /** Cheap driver-side estimate of the benchmark side's broadcast size:
    * rowCount x dim x 8 bytes (one count job + one first-row peek on
    * the SMALL side — the guard must not scan the corpus). Empty
    * benchmark → trivially broadcastable.
    */
  private def benchmarkBroadcastable(
      benchmark: DataFrame, benchVecCol: String, maxBytes: Long): Boolean = {
    val agg = benchmark
      .agg(count(lit(1)).as("n"), max(size(col(benchVecCol))).as("dim"))
      .head()
    val n = agg.getLong(0)
    val dim = if (agg.isNullAt(1)) 0L else agg.getInt(1).toLong
    n * dim * 8L <= maxBytes
  }

  /** The training corpus with semantically contaminated documents
    * removed. A LEFT ANTI BroadcastNestedLoopJoin on the cosine
    * condition directly: per corpus row the benchmark scan short-circuits
    * at the first match, and no flagged-id table is ever materialized —
    * cheaper than [[semanticContaminated]] + anti join when only the
    * surviving corpus is wanted.
    */
  def semanticDecontaminate(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double,
      broadcastBenchmark: Boolean = true,
      maxBroadcastBytes: Long = DefaultMaxBroadcastBytes
  ): DataFrame = {
    if (broadcastBenchmark && !benchmarkBroadcastable(benchmark, benchVecCol, maxBroadcastBytes)) {
      // same safety valve as semanticContaminated: flag through the
      // IVF-bucketed path, then anti-join the corpus on id (an
      // equi-join — shuffles only flagged ids, never vectors)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semanticDecontaminate: benchmark exceeds the $maxBroadcastBytes-byte broadcast budget — " +
          "falling back to the APPROXIMATE IVF-bucketed path (recall<1). Pre-shard the benchmark " +
          "or raise maxBroadcastBytes for exact results.")
      val flagged = semanticContaminatedIvf(
        train, idCol, vecCol, benchmark, benchVecCol, threshold).select(col(idCol))
      return train.join(flagged, Seq(idCol), "left_anti")
    }
    val bench0 = benchmark.select(
      transform(col(benchVecCol), x => x.cast("double")).as("__bvec"))
    val bench = if (broadcastBenchmark) broadcast(bench0) else bench0
    val probe = train.withColumn(
      "__tvec", transform(col(vecCol), x => x.cast("double")))
    probe
      .join(bench, Similarity.cosine(col("__tvec"), col("__bvec")) >= threshold, "left_anti")
      .drop("__tvec")
  }

  /** IVF-bucketed [[semanticContaminated]] for benchmark sets too large
    * to broadcast-scan against every corpus row: corpus vectors are
    * assigned to their single nearest coarse centroid
    * ([[Similarity.kmeansCentroids]] — centroids are the ONLY
    * driver-side collect, bounded by `nCentroids`), each benchmark
    * vector probes its `nProbe` nearest buckets, and cosine is evaluated
    * only on bucket-colocated pairs — ~nProbe/nCentroids of the
    * all-pairs work. Approximate by construction (a contaminated pair
    * whose benchmark vector does not probe the corpus row's bucket is
    * missed); the `doc_semantic_decontam_ivf_recall` gate pins the
    * flagged-set recall against the exact path.
    */
  def semanticContaminatedIvf(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      benchmark: DataFrame,
      benchVecCol: String,
      threshold: Double,
      /** 0 (default) = √(corpus rows), [[Similarity.autoCentroids]]: a
        * FIXED count keeps per-bucket share at N/nCentroids — join
        * volume a constant fraction of all-pairs, i.e. still O(N·M)
        * asymptotically (the r13 sf10 144× outlier); √N sizing makes it
        * √N·M·nProbe.
        */
      nCentroids: Int = 0,
      /** 0 (default) = [[Similarity.autoProbes]] of resolved nCentroids. */
      nProbe: Int = 0,
      kmeansIterations: Int = 0
  ): DataFrame = {
    val c = train.select(
      col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__tvec"))
    val nCent = if (nCentroids > 0) nCentroids else Similarity.autoCentroids(train.count())
    val centroids =
      if (kmeansIterations > 0)
        Similarity.kmeansCentroids(train, idCol, vecCol, nCent, kmeansIterations)
      else
        c.orderBy(col(idCol)).limit(nCent).collect().map(_.getSeq[Double](1)).toSeq
    val probeN = if (nProbe > 0) nProbe else Similarity.autoProbes(centroids.size)
    // one broadcast shared by corpus assignment and benchmark probes —
    // centroids never ride the plan as literals (VERDICT r14 #3)
    val bc = Similarity.broadcastCentroids(centroids)
    val bucketed = c.withColumn(
      "__b", Similarity.nearestCentroidBuckets(col("__tvec"), bc, 1).getItem(0))
    val probes = benchmark
      .select(transform(col(benchVecCol), x => x.cast("double")).as("__bvec"))
      .select(col("__bvec"),
        explode(Similarity.nearestCentroidBuckets(col("__bvec"), bc, probeN)).as("__b"))
    val sim = Similarity.cosine(col("__tvec"), col("__bvec"))
    bucketed
      .join(probes, "__b")
      .where(sim >= threshold)
      .select(col(idCol), sim.as("__sim"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), max(col("__sim")).as("max_cosine"))
  }
}
