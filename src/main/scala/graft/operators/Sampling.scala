package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything here keys off a cryptographic hash of a stable identifier
  * instead of `rand()`: the sample is reproducible across runs,
  * clusters, and engines (no RNG state, no partitioning sensitivity),
  * membership is stable under corpus growth (a doc's split never
  * changes because other docs arrived), and results are verifiable
  * against any SQL engine with `md5`. This is how production corpora
  * carve train/eval: hash-gating, not random draws.
  *
  * Scale shapes: `deterministicSample` is a TakeOrdered (map-side
  * partial top-k, only k-lists shuffle); `hashSplit` is a stateless
  * per-row projection (no shuffle at all); `stratifiedSample` is one
  * hash shuffle on the stratum key.
  */
object Sampling {

  /** Lowercase hex md5 of the key column — the sampling axis. */
  def samplingHash(key: Column): Column = md5(key.cast("string"))

  /** k rows, chosen deterministically: the k smallest md5 hashes of
    * `keyCol`. Equivalent to a uniform k-sample when keys are
    * hash-uncorrelated with content.
    */
  def deterministicSample(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.withColumn("__h", samplingHash(col(keyCol)))
      .orderBy(col("__h"))
      .limit(k)
      .drop("__h")

  /** Assign each row a named split by hash-gating on hex prefixes.
    * `bounds` are (name, upperHexBound) pairs in ascending bound order;
    * a row lands in the first split whose bound its md5 precedes, the
    * last split catching the rest. E.g.
    * `Seq(("eval", "0a"), ("test", "14"))` + default "train" ≈
    * 3.9% / 3.9% / 92.2% (hex-string prefix mass).
    * No shuffle — a per-row projection, stable under corpus growth.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      bounds: Seq[(String, String)],
      defaultSplit: String = "train",
      splitCol: String = "split"
  ): DataFrame = {
    require(bounds.nonEmpty, "at least one (name, bound) pair required")
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      s"split bounds must ascend (later splits would be unreachable): ${bounds.map(_._2).mkString(", ")}")
    val h = samplingHash(col(keyCol))
    val assigned = bounds.foldRight(lit(defaultSplit): Column) { case ((name, bound), rest) =>
      when(h < lit(bound), lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, assigned)
  }

  /** [[hashSplit]] that cannot leak near-duplicates across splits: rows
    * are split-assigned by their DUPLICATE-CLUSTER representative, not
    * their own id, so a train/eval boundary never separates two
    * documents that [[Dedup]] found to be near-copies of each other (the
    * eval-contamination hazard of naive per-document splitting).
    * `pairs` is any duplicate-pair frame (aCol, bCol); clusters are its
    * connected components, singletons represent themselves. One
    * CC computation + one left join on the id — the corpus never
    * shuffles for the assignment itself, and membership stays stable as
    * long as clusters do.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      bounds: Seq[(String, String)],
      defaultSplit: String = "train",
      splitCol: String = "split"
  ): DataFrame = {
    val comps = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("component").as("__rep"))
    val withRep = docs.join(comps, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("__rep"), col(idCol)))
    hashSplit(withRep, "__rep", bounds, defaultSplit, splitCol).drop("__rep")
  }

  /** Deterministic TOKEN-budgeted sampling per group — epoch composition
    * the way training mixes are actually specified ("20M tokens of en,
    * 5M of fr"), not by document count: within each group, documents are
    * ordered by their md5 hash and kept while the running token total
    * stays within the group's budget (inclusive; groups absent from
    * `budgets` get `defaultBudget`). Selection is reproducible in any
    * engine (same hash order, same cumsum) and monotone in the budget —
    * raising a group's budget only appends documents.
    *
    * Scale shape: the naive form is one window partitioned by GROUP —
    * a single reducer per group, a straggler when one group is most of
    * the corpus. Here the hash's first two hex digits split every group
    * into 256 sub-partitions: per-bucket token sums (≤ groups×256 rows)
    * prefix-sum into bucket offsets with a window over that TINY
    * aggregate (≤256 rows per group — nothing ever comes to the
    * driver, so a per-domain budget over millions of domains stays
    * distributed), and the within-bucket window runs 256-way parallel
    * per group. Because the bucket is a PREFIX of the ordering hash,
    * bucket-offset + in-bucket cumsum equals the global per-group
    * cumsum exactly. The offsets join is unhinted: AQE broadcasts it
    * when small, and a genuinely huge group set shuffle-joins instead
    * of overwhelming the driver with a broadcast.
    */
  def tokenBudgetSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      tokensCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L
  ): DataFrame = {
    require(budgets.nonEmpty || defaultBudget > 0, "no budget given")
    val h = samplingHash(col(keyCol))
    // the group key is staged as (string rendering, is-null): the string
    // cast makes any group column type drive the string-keyed budget map,
    // and the null flag keeps NULL-group rows flowing through the offsets
    // equi-join (a raw null key matches nothing) so they draw
    // defaultBudget instead of silently vanishing
    val staged = df.withColumn("__h", h).withColumn("__hb", substring(col("__h"), 1, 2))
      .withColumn("__gs", coalesce(col(groupCol).cast("string"), lit("")))
      .withColumn("__gn", col(groupCol).isNull)
    val perBucket = staged.groupBy(col("__gs"), col("__gn"), col("__hb"))
      .agg(sum(col(tokensCol)).as("__bsum"))
    // exclusive prefix sum of bucket sums within each group = bucket
    // offsets; the window runs over the ≤256-rows-per-group aggregate
    val offWin = Window.partitionBy(col("__gs"), col("__gn"))
      .orderBy(col("__hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = perBucket
      .withColumn("__boff", coalesce(sum(col("__bsum")).over(offWin), lit(0L)))
      .drop("__bsum")
    val budgetOf = coalesce(
      element_at(typedlit(budgets), col(groupCol).cast("string")), lit(defaultBudget))
    val win = Window.partitionBy(col("__gs"), col("__gn"), col("__hb"))
      .orderBy(col("__h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .join(offDf, Seq("__gs", "__gn", "__hb"))
      .withColumn("__cum", col("__boff") + sum(col(tokensCol)).over(win))
      .where(col("__cum") <= budgetOf)
      .drop("__h", "__hb", "__gs", "__gn", "__boff", "__cum")
  }

  /** Per-group sampling fractions — the data-MIXING step of corpus
    * assembly (e.g. "50% of en, 25% of zh, all the rest"): keep a row
    * iff its 60-bit md5 hash of `keyCol` falls below
    * `fraction(group) * 2^60`. A stateless per-row projection (no
    * shuffle), reproducible in any engine, and membership is MONOTONE in
    * the fraction: raising a group's weight only ADDS documents, never
    * reshuffles the ones already selected — the property that keeps
    * mixture re-weighting cheap across training runs. Groups absent
    * from the map keep `defaultFraction`.
    *
    * Pass fractions with exact binary representations (k/2^n: 0.5,
    * 0.25, 0.375, …) when cross-engine replication of the exact
    * member set matters; arbitrary doubles still sample correctly but
    * the threshold literal is engine-float-rounded.
    */
  def mixtureSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0
  ): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions default=$defaultFraction")
    def thresholdOf(f: Double): Long =
      if (f >= 1.0) Long.MaxValue else (f * (1L << 60).toDouble).toLong
    val h = graft.functions.TextFunctions.md5Hash60(col(keyCol).cast("string"))
    val thresh = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdOf(defaultFraction)): Column) { case (rest, (g, f)) =>
        when(col(groupCol) === g, lit(thresholdOf(f))).otherwise(rest)
      }
    df.where(h < thresh)
  }

  /** Temperature-weighted mixture (α-sampling, the multilingual
    * rebalancing rule mT5/XLM-R popularized): sample group `i` with
    * probability ∝ p_i^α where p_i is its corpus share, flattening the
    * head so low-resource groups survive. Per-group keep fractions
    * derive from the data — f_i = min(1, targetFraction · N ·
    * (n_i^α / Σ n_j^α) / n_i) — then apply as the same stateless
    * md5-gate projection as [[mixtureSample]]: membership stays
    * deterministic, monotone in targetFraction, and engine-verifiable.
    *
    * Scale shape: ONE map-side-combined count aggregate over the corpus
    * (k rows to the driver, k = #groups — bounded like languages or
    * sources), then a pure projection; the corpus never shuffles.
    *
    * Exactness: α = 0.5 (the default and the gated value) computes via
    * `sqrt`, which IEEE 754 rounds exactly — every step of f_i
    * (sqrt, ·, /) is then a correctly-rounded double op any engine
    * reproduces bit-for-bit, up to the Σ n_j^α addition order (k-term
    * sum; a last-ulp divergence would need a doc's 60-bit hash to land
    * within ~2^7 of the threshold — odds ~2^-53 per doc). Other α are
    * supported but use `pow`, whose libm rounding is not cross-engine
    * portable — don't oracle-gate those.
    *
    * `groupCol` must be a string column (like [[mixtureSample]]'s map
    * keys); NULL-group rows are excluded from N and Σ and are dropped.
    */
  def temperatureMixture(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      targetFraction: Double,
      alpha: Double = 0.5
  ): DataFrame = {
    require(targetFraction >= 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in [0,1]: $targetFraction")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    // group name order fixes the Σ addition order (determinism across
    // runs); NULL-group rows get no fraction and fall to the md5 gate's
    // default-0 arm (dropped), same as any group absent from the map
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect()
      .flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    def powA(x: Double): Double = if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val z = counts.map { case (_, n) => powA(n.toDouble) }.sum
    val fractions = counts.map { case (g, n) =>
      // association mirrors the oracle SQL exactly: ((((tf·N)·n^α)/z)/n)
      g -> math.min(1.0, targetFraction * total.toDouble * powA(n.toDouble) / z / n.toDouble)
    }.toMap
    mixtureSample(df, keyCol, groupCol, fractions, defaultFraction = 0.0)
  }

  /** k rows per stratum, deterministically: per-group k smallest md5
    * hashes — selection identical to a per-stratum
    * `row_number() over (partition by strata order by md5(key)) <= k`.
    *
    * Scale shape: NOT that window — partitioned on the strata alone it
    * sends each stratum to ONE reducer and sorts it whole, so a corpus
    * that is 90% one language serializes on a single task. Same
    * discipline as [[tokenBudgetSample]]: the hash's first two hex
    * digits split every stratum into 256 sub-buckets; per-bucket counts
    * (map-side-combined aggregate, ≤256 rows per stratum) prefix-sum
    * into bucket start-ranks over that tiny aggregate, buckets that end
    * at or below k are kept WHOLE with no sort at all, and only the one
    * boundary bucket per stratum (~1/256 of the stratum) pays a
    * row_number. Because the bucket is a PREFIX of the ordering hash,
    * bucket-rank + in-bucket rank equals the global per-stratum rank
    * exactly. Ties (md5 collisions between distinct keys) break on the
    * key itself, making the sample fully deterministic.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], keyCol: String, k: Int): DataFrame = {
    val strata = strataCols.map(col)
    val staged = df
      .withColumn("__h", samplingHash(col(keyCol)))
      .withColumn("__hb", substring(col("__h"), 1, 2))
    val counts = staged.groupBy(strata :+ col("__hb"): _*).agg(count(lit(1)).as("__bn"))
    val offWin = Window.partitionBy(strata: _*).orderBy(col("__hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.withColumn("__boff", coalesce(sum(col("__bn")).over(offWin), lit(0L)))
    // unhinted join on (strata, bucket): the offsets frame is
    // strata×256 rows — AQE broadcasts it when small, and a huge
    // stratum set shuffle-joins instead of flooding the driver
    val joined = staged.join(offs, strataCols :+ "__hb")
    val whole = joined.where(col("__boff") + col("__bn") <= k)
    val boundary = joined.where(col("__boff") < k && col("__boff") + col("__bn") > k)
    val inWin = Window.partitionBy(strata :+ col("__hb"): _*).orderBy(col("__h"), col(keyCol))
    val fromBoundary = boundary
      .withColumn("__rn", row_number().over(inWin))
      .where(col("__boff") + col("__rn") <= k)
      .drop("__rn")
    whole.unionAll(fromBoundary).drop("__h", "__hb", "__bn", "__boff")
  }
}
