package graft.streaming

import graft.operators.Dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Incremental (streaming) near-duplicate detection — the pipeline shape
  * a continuously-ingesting training-data corpus needs: new documents
  * arrive on a change stream, and each must be checked against BOTH the
  * accumulated corpus and its own arrival batch, without ever re-running
  * the full batch LSH join.
  *
  * Per micro-batch (foreachBatch):
  *   1. MinHash signatures + banded LSH buckets for the batch's docs —
  *      the same banding as [[graft.operators.Dedup.minhashCandidates]],
  *      so the accumulated result is identical to the batch operator run
  *      over the union (gated against the same exhaustive oracle, and
  *      asserted equal to the batch operator in StreamingDedupSpec).
  *      One deliberate divergence: the batch operator's OVERSIZED-BUCKET
  *      guard (maxBucket sub-splitting, which trades bounded recall loss
  *      in degenerate buckets for a cost bound) has no streaming
  *      counterpart — sub-bucket assignment depends on bucket size,
  *      which changes as the index grows, so a consistent split across
  *      batches is impossible without rewriting history. Streaming
  *      therefore returns a SUPERSET of a guard-engaged batch run (equal
  *      whenever no bucket exceeds maxBucket — every gated fixture), and
  *      a degenerate bucket's cost grows with its index size: a corpus
  *      where millions of documents share a band bucket is exactly what
  *      [[compactIndex]] + the batch operator's periodic re-dedup are
  *      for, not per-batch probing.
  *   2. Candidates = batch buckets ⋈ accumulated bucket index (new vs
  *      old) ∪ batch self-join (new vs new).
  *   3. Exact verification: true Jaccard on sorted shingle hashes
  *      (native merge walk), only on candidates.
  *   4. Append confirmed pairs to the result, then append the batch's
  *      buckets + shingles to the index — parquet appends, so the index
  *      survives restarts and is readable by any later job.
  *
  * Scale shape: each batch's bucket rows join against the index on
  * (band, bucket) — at real ingest rates the batch side is broadcast-
  * sized and Catalyst picks BHJ from the frame sizes on its own (hints
  * were measured slower here at fixture scale: the extra broadcast
  * collect/build rounds cost more than the 2 MB shuffle they avoid).
  *
  * Delivery: all three datasets (pairs, bands index, shingles) live in a
  * [[CommitLog]] — data files are invisible until their manifest
  * publishes atomically, and each dataset's append is independently
  * idempotent per micro-batch id, so a crash anywhere in the batch
  * replays to exactly the missing commits and nothing duplicates:
  * EXACTLY-ONCE end to end when driven from a checkpointed stream.
  * Batch callers invoking [[processBatch]] without a batchId get
  * atomic-publish at-least-once (reads still dedup defensively).
  */
object StreamingDedup {

  // sigb: the 1-byte-per-component signature sketch, carried on every
  // band row so the bucket joins can prefilter candidates by estimated
  // Jaccard INLINE (Dedup.estimateCut) — same estimator, same cut as the
  // batch operator, so incremental == batch holds exactly (signatures
  // are deterministic; both paths drop precisely the same pairs)
  private def bandsSchema = StructType(Seq(
    StructField("id", LongType), StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("sigb", org.apache.spark.sql.types.BinaryType)))
  private def shinglesSchema = StructType(Seq(
    StructField("id", LongType), StructField("sh", ArrayType(LongType))))

  /** Batch-side broadcast budget for the index probe join, in band rows
    * (docs × bands). 500k rows ≈ 75–100 MB with the sigb sketch — small
    * enough to pin, large enough to cover any steady-state micro-batch;
    * catch-up batches past it fall back to the shuffle_hash plan.
    */
  private val MaxBroadcastBandRows = 500000L

  /** Accumulated-shingle-log size below which the verify joins always
    * take the direct plan (see the gate comment in [[processBatch]]).
    * 64 MB ≈ a million short documents' hashes — well before the
    * per-batch full-log shuffle dominates. Overridable per session
    * (ops knob + A/B measurement):
    * `spark.graft.streaming.verifySemiFilterMinBytes`; Long.MaxValue
    * disables the semi filter entirely, a negative value forces it.
    */
  private val VerifySemiFilterMinBytes = 64L * 1024 * 1024

  private[graft] val VerifySemiFilterConf =
    "spark.graft.streaming.verifySemiFilterMinBytes"

  /** Concurrent compaction width for [[compactIndexDetailed]] (default
    * 3 = one thread per dataset): see the envelope note there.
    */
  private[graft] val MaintenanceParallelismConf =
    "spark.graft.streaming.maintenanceParallelism"

  private def verifySemiFilterMinBytes(spark: SparkSession): Long =
    spark.conf.getOption(VerifySemiFilterConf).map(_.toLong).getOrElse(VerifySemiFilterMinBytes)

  /** Duplicate-coverage ceiling for the verify semi filter: the filter
    * only pays when the candidate ids are a SMALL fraction of the
    * corpus (each kept id still rides both pair-join shuffles — at high
    * coverage the filter's persist/distinct/broadcast machinery buys
    * almost no shuffle reduction; measured at the 100× probe on a
    * duplication-saturated corpus: direct 176.5s vs semi 254.2s).
    * Coverage is estimated from ALREADY-COMMITTED data with zero jobs:
    * 2 × confirmed-pair rows / corpus rows, both read from parquet
    * footers driver-side. Confirmed pairs under-count candidates, but
    * with the signature prefilter candidates ≈ near-threshold pairs,
    * and the proxy errs toward the direct plan — the safe default.
    */
  private val VerifySemiFilterMaxCoverage = 0.2

  /** Driver-side exact row count of a CommitLog dataset from parquet
    * footers (no Spark job; file count is bounded by compaction).
    */
  private[streaming] def footerRows(spark: SparkSession, dir: String): Long =
    CommitLog.rowCount(spark, dir)

  /** Run independent driver actions concurrently (guide §2.6: Spark
    * schedules jobs submitted from several threads at once, so a later
    * job's tasks back-fill executors freed by the current job's tail).
    * Propagates the first failure; always waits for every unit.
    */
  private[streaming] def parallelUnits(units: Seq[() => Unit], maxThreads: Int = Int.MaxValue): Unit = {
    val width = math.min(units.size, math.max(1, maxThreads))
    if (width <= 1 || units.size <= 1) { units.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(width)
    try {
      val fs = units.map(u => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = u()
      }))
      // collect EVERY outcome before rethrowing (ADVICE r18): bailing on
      // the first failed get() left the remaining commit/compaction jobs
      // running in the background while the caller unwound and possibly
      // retried/cleaned up concurrently — "always waits for every unit"
      // must mean waits-then-throws, not throws-then-abandons
      val failures = fs.flatMap { f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException => Some(e.getCause)
          case e: Throwable => Some(e)
        }
      }
      failures.headOption.foreach { first =>
        failures.drop(1).foreach(first.addSuppressed)
        throw first
      }
    } finally pool.shutdown()
  }

  /** Bucket-hash partition count for the COMPACTED bands index layout
    * (VERDICT r14 #5): [[compactIndex]] rewrites the index into
    * `__p64=<k>/` partition dirs keyed on `xxhash64(band, bucket) % 64`,
    * and each batch's probe then reads ONLY the partitions its own
    * (band, bucket) pairs hash into — a small steady-state batch touches
    * ≤ docs×bands of the 64, so probe I/O scales with the batch, not
    * the accumulated index. The MODULUS rides in the partition-column
    * NAME, so readers always prune with exactly the writer's hash —
    * self-describing and atomic with the fileset (a sidecar meta file
    * could go stale across a crashed re-compaction; the path cannot).
    */
  private[streaming] val IndexPartitions = 64

  private val PartDirRe = TieredCompaction.PartDirRe

  /** The files a batch with `touchedByModulus` (modulus → partition ids
    * its probe keys hash into) must read: partitioned files whose
    * (modulus, value) is touched, plus every un-partitioned file
    * (pre-compaction appends), plus files with a modulus we did not
    * compute (never prune on incomplete information). Layout-generic:
    * the bands index prunes on xxhash64(band, bucket) and the shingles
    * log on xxhash64(id) — both ride the same `__p<modulus>=<value>/`
    * path convention, so the writer's hash modulus is always exactly
    * the reader's.
    */
  private[graft] def pruneBandFiles(
      files: Seq[String], touchedByModulus: Map[Int, Set[Int]]): Seq[String] =
    TieredCompaction.pruneFiles(files, touchedByModulus)

  /** Start the incremental dedup over a STREAMING (idCol, textCol) frame.
    * Confirmed pairs land under `workDir`/pairs as (id1, id2, jaccard),
    * id1 < id2, exactly the batch operator's output contract.
    *
    * `checkpoint` is REQUIRED: the replay-skip guard keys commits by
    * micro-batch id, and batch ids are only meaningful relative to a
    * query checkpoint. Without one, a second run over the same
    * `workDir` would restart ids at 0 and the guard would silently
    * DISCARD the new batches — exactly-once degrading to silent loss.
    * One checkpoint per workDir, reused across restarts.
    */
  def incrementalNearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      workDir: String,
      threshold: Double = 0.9,
      shingleK: Int = 5,
      numHashes: Int = 120,
      bands: Int = 20,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpoint: String
  ): StreamingQuery = {
    require(numHashes % bands == 0, s"numHashes=$numHashes must divide into bands=$bands")
    val spark = docs.sparkSession
    // idempotent: creates the logs on first start, touches nothing on a
    // checkpoint restart — the accumulated index and pairs survive
    incrementalNearDuplicatesInit(spark, workDir)
    val w = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatch(batch, workDir, threshold, shingleK, numHashes, bands, Some(bid)): Unit
      }
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
    w.start()
  }

  /** Initialize the three commit logs (idempotent) so every batch can
    * read them unconditionally.
    */
  def incrementalNearDuplicatesInit(spark: SparkSession, workDir: String): Unit = {
    CommitLog.init(s"$workDir/bands", bandsSchema)
    // migrate pre-sigb bands logs in place (ADVICE r14): init never
    // rewrites an existing _schema.json, so a workDir created before the
    // sketch column froze a 3-column schema and every later batch failed
    // analysis on col("o.sigb"). Adding the column is a metadata edit
    // (parquet schema evolution reads legacy rows with sigb = null; the
    // null-tolerant prefilter below routes them to exact verify).
    CommitLog.evolveSchema(s"$workDir/bands", bandsSchema)
    CommitLog.init(s"$workDir/shingles", shinglesSchema)
    CommitLog.init(s"$workDir/pairs",
      StructType(Seq(StructField("id1", LongType), StructField("id2", LongType),
        StructField("jaccard", org.apache.spark.sql.types.DoubleType))))
  }

  /** Per-batch I/O telemetry returned by [[processBatch]]: how far the
    * partition prunes narrowed the accumulated-index reads (file counts
    * and on-disk bytes, exact — the prune is a driver-side file-list
    * decision). `selected == total` until the first partitioned
    * compaction, or when a batch genuinely touches everything.
    */
  final case class BatchStats(
      replayed: Boolean,
      bandFilesSelected: Int, bandFilesTotal: Int,
      bandBytesSelected: Long, bandBytesTotal: Long,
      shFilesSelected: Int, shFilesTotal: Int,
      shBytesSelected: Long, shBytesTotal: Long)

  /** One ingest batch: detect new-vs-index and new-vs-new duplicates,
    * then fold the batch into the index. Public so a non-streaming
    * caller (periodic ingest job) can drive the same incremental logic.
    * Returns the batch's prune telemetry ([[BatchStats]]) — streaming
    * callers discard it.
    */
  def processBatch(
      batch: DataFrame,
      workDir: String,
      threshold: Double,
      shingleK: Int,
      numHashes: Int,
      bands: Int,
      batchId: Option[Long] = None
  ): BatchStats = {
    val spark = batch.sparkSession
    // fast path: every dataset already holds this batch's commit — the
    // stream replayed a fully-processed batch, nothing to recompute
    if (batchId.exists(b =>
        Seq("pairs", "bands", "shingles").forall(d =>
          CommitLog.isCommitted(s"$workDir/$d", b))))
      return BatchStats(replayed = true, 0, 0, 0L, 0L, 0, 0, 0L, 0L)
    // batch-mode callers may drive a legacy (pre-sigb) workDir without
    // going through init — same validation and metadata-only migration
    // (a floor-divided rowsPerBand would silently band over a signature
    // prefix, diverging from every Dedup.minhashCandidates run)
    require(bands > 0 && numHashes % bands == 0,
      s"numHashes=$numHashes must divide into bands=$bands")
    CommitLog.evolveSchema(s"$workDir/bands", bandsSchema)
    val rowsPerBand = numHashes / bands
    // the id is hashed (xxhash64) by both partition prunes against logs
    // whose compaction writer hashed LONGS — an IntegerType id from a
    // batch-mode caller would hash differently, prune away the true
    // partitions, and silently miss duplicate pairs (ADVICE r16): pin
    // the type at entry, exactly like incrementalNearDuplicates does
    val base = batch.select(
      col("id").cast("long").as("id"),
      Dedup.minhashSignature(col("text"), shingleK, numHashes).as("sig"),
      Dedup.sortedShingleHashes(col("text"), shingleK).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val newBands = base.select(
        col("id"),
        Dedup.packSigBytes(col("sig")).as("sigb"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
          )
        ).as(Seq("band", "bucket")))
      val newSh = base.select(col("id"), col("sh"))

      // index probe with PARTITION PRUNING over a compacted
      // ([[compactIndex]]) bucket-partitioned layout: only the files
      // whose bucket-hash partition this batch's (band, bucket) pairs
      // touch are read — identical join result (a matching index row
      // shares the batch row's (band, bucket), hence its partition)
      val bandsDir = s"$workDir/bands"
      val allBandFiles = CommitLog.currentFiles(bandsDir)
      val bandFiles = {
        val moduli =
          allBandFiles.flatMap(f => PartDirRe.findFirstMatchIn(f).map(_.group(1).toInt)).distinct
        if (moduli.isEmpty) allBandFiles
        else {
          // one tiny distinct job per modulus over the (persisted)
          // batch bands — realistically exactly one modulus. Modulus 1
          // (the sorted-hybrid marker) always hashes to 0: no job.
          val touched = moduli.map { m =>
            if (m == 1) m -> Set(0)
            else m -> newBands
              .select(pmod(xxhash64(col("band"), col("bucket")), lit(m.toLong)).cast("int").as("p"))
              .distinct().collect().map(_.getInt(0)).toSet
          }.toMap
          pruneBandFiles(allBandFiles, touched)
        }
      }
      val oldBands =
        CommitLog.readFiles(spark, bandsDir, CommitLog.schemaOf(bandsDir), bandFiles)
      // estimated-Jaccard prefilter inline in both bucket joins (batch
      // operator's exact machinery — see Dedup.estimateCut): the low-j
      // candidate mass dies in codegen before distinct/verify.
      // NULL-TOLERANT (ADVICE r14): index rows written before the sigb
      // column exist with sigb = null after the schema migration, and a
      // null predicate would silently drop every candidate against the
      // pre-upgrade index — coalesce(..., true) routes those rows past
      // the prefilter to exact verification instead.
      val estCut = Dedup.estimateCut(threshold, numHashes)
      def estOk(a: Column, b: Column): Column =
        if (estCut > 0.0) coalesce(Dedup.sigAgreement(a, b) >= lit(estCut), lit(true))
        else lit(true)
      // Index-side join shape — the sf10 curve-bender (VERDICT r14 #5):
      // the batch side is micro-batch-sized, so BROADCAST it and let the
      // accumulated index STREAM map-side — the index (the one frame that
      // grows without bound) is never shuffled, never sorted, never
      // hash-built; per-batch cost is one index scan. Guarded by batch
      // size: an AvailableNow catch-up batch can be the whole backlog,
      // and broadcasting that would OOM — past the row budget the old
      // shuffle_hash plan (shuffles both sides, sorts neither) returns.
      val batchBandRows = base.count() * bands
      val broadcastBatch = batchBandRows <= MaxBroadcastBandRows
      // the shuffled-hash hints below are a MICRO-BATCH optimization
      // (SMJ would sort shingle arrays per trigger: +2.6s at sf0.1) and
      // share the broadcast gate's size signal: a catch-up batch's
      // candidate set can put GBs behind one skewed id (a hub doc in a
      // degenerate near-dup cluster), and a shuffled-hash BUILD cannot
      // spill — the r17 sf10 run died with "Can't acquire 8589934592
      // bytes to build hash relation" on exactly that shape. Past the
      // budget the hints come off and AQE plans spillable sort-merge
      // with skew-join splitting — the 100 TB catch-up path.
      def microBatchHint(df: DataFrame): DataFrame =
        if (broadcastBatch) df.hint("shuffle_hash") else df
      // fallback build side = the BATCH, never the index: a shuffled hash
      // join cannot spill its build side, and the index is the one frame
      // that grows without bound — building it OOM'd outright at the 3.2M
      // doc steady-state probe ("not enough memory to build hash map")
      // while the batch side is backlog-bounded
      val crossJoined =
        if (broadcastBatch)
          oldBands.alias("o").join(broadcast(newBands.alias("n")), Seq("band", "bucket"))
        else
          newBands.alias("n").hint("shuffle_hash").join(oldBands.alias("o"), Seq("band", "bucket"))
      val cross = crossJoined
        // a crash between the index append and the checkpoint commit makes
        // the restarted batch meet ITSELF in the index — the id guard keeps
        // that at-least-once replay from emitting self-pairs
        .where(col("n.id") =!= col("o.id") && estOk(col("n.sigb"), col("o.sigb")))
        .select(
          least(col("n.id"), col("o.id")).as("id1"),
          greatest(col("n.id"), col("o.id")).as("id2"))
      val within = newBands.alias("a")
        .join(microBatchHint(newBands.alias("b")), Seq("band", "bucket"))
        .where(col("a.id") < col("b.id") && estOk(col("a.sigb"), col("b.sigb")))
        .select(col("a.id").as("id1"), col("b.id").as("id2"))
      // Verify-side semi filter, GATED on size AND duplicate coverage
      // (VERDICT r14 #5, second half): once the accumulated shingles log
      // is big, joining it whole per batch shuffles the entire corpus
      // every trigger — the semi filter bounds the shuffled volume by
      // CANDIDATE ids (pair-bounded, broadcast), so per-batch verify I/O
      // scales with the batch's duplicates, not the corpus. Three
      // regimes keep the direct r14 plan instead:
      //   - small logs: the filter's persist/broadcast machinery costs
      //     more than the small shuffle it avoids (+1.4 s sf0.1);
      //   - duplication-saturated corpora: candidate ids cover most of
      //     the corpus, so the filter pays its machinery and still
      //     shuffles nearly everything (100× probe: 254.2s vs 176.5s);
      //   - a candidate set too big to broadcast (budget check on THIS
      //     batch's candidates, below) — the committed-data coverage
      //     gate cannot see a duplicate-heavy catch-up batch.
      // The first two signals are driver-side (file lengths + parquet
      // footer row counts of already-committed data) — no job runs to
      // decide; the third reuses the persist the filter needs anyway.
      val shinglesDir = s"$workDir/shingles"
      val shFilesAll = CommitLog.currentFiles(shinglesDir)
      val shModuli = shFilesAll
        .flatMap(f => PartDirRe.findFirstMatchIn(f).map(_.group(1).toInt)).distinct
      val semiFloor = verifySemiFilterMinBytes(spark)
      val wantSemi =
        if (semiFloor < 0L) true
        else {
          val logBytes = shFilesAll
            .map(f => new java.io.File(s"$shinglesDir/$f").length).sum
          logBytes >= semiFloor && {
            val corpusRows = footerRows(spark, shinglesDir)
            val dupTouched = 2L * footerRows(spark, s"$workDir/pairs")
            corpusRows > 0L &&
              dupTouched.toDouble / corpusRows.toDouble <= VerifySemiFilterMaxCoverage
          }
        }
      // persisted when either consumer below references the candidate
      // frame more than once — the verify semi filter (three branches)
      // or the shingle-partition prune (a driver-side collect of the
      // candidate ids' partitions, then the two pair joins). Without a
      // cache each reference would re-run the bucket joins — tripling
      // the per-batch index scan. Unfiltered, candidates feed ONE plan.
      val candsRaw = cross.union(within).distinct()
      // modulus-1 marker files never need the candidate ids to prune —
      // don't pay the persist just for them
      val persistCands = wantSemi || shModuli.exists(_ != 1)
      val cands =
        if (persistCands) candsRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else candsRaw
      try {
        // Verify-side SCAN prune over a compacted ([[compactIndex]])
        // id-hash-partitioned shingles log: the verify joins only ever
        // match shingle rows whose id appears in a candidate pair, so a
        // partition no candidate id hashes into cannot contribute —
        // per-batch verify INPUT I/O is bounded by the batch's
        // candidates (touched partitions), not the accumulated corpus.
        // The semi filter below bounds what the verify SHUFFLES; this
        // bounds what it READS. Pre-compaction (no `__p<m>=` files) the
        // whole log is read, exactly as before.
        val shFilesSel =
          if (shModuli.isEmpty) shFilesAll
          else {
            val touched = shModuli.map { m =>
              if (m == 1) m -> Set(0)
              else m -> cands.select(pmod(xxhash64(col("id1")), lit(m.toLong)).cast("int").as("p"))
                .union(cands.select(pmod(xxhash64(col("id2")), lit(m.toLong)).cast("int").as("p")))
                .distinct().collect().map(_.getInt(0)).toSet
            }.toMap
            pruneBandFiles(shFilesAll, touched)
          }
        val oldSh =
          CommitLog.readFiles(spark, shinglesDir, CommitLog.schemaOf(shinglesDir), shFilesSel)
        // the coverage gate above inspects only COMMITTED data, so a
        // duplicate-heavy catch-up batch could still make the candidate
        // id set broadcast-fatal (the adjacent index join guards its
        // broadcast by batch size for exactly this reason). The persist
        // makes counting candidates one cheap reuse of work the three
        // consumers materialize anyway — size the broadcast on THIS
        // batch's candidates, falling back to the direct plan past the
        // budget: 2 ids/pair × (8 B long + 48 B row) × 2× relation
        // overhead against heap/16 (capped 750 MB), the exactVerifyJoin
        // budget discipline.
        val semiFilter = wantSemi && {
          val budget = math.min(750L * 1024 * 1024, Runtime.getRuntime.maxMemory / 16)
          2L * cands.count() * (8L + 48L) * 2L <= budget
        }
        val allShBase = newSh.union(oldSh)
        val allSh =
          if (semiFilter) {
            val candIds = cands.select(col("id1").as("id"))
              .union(cands.select(col("id2").as("id"))).distinct()
            allShBase.join(broadcast(candIds), Seq("id"), "left_semi")
          } else allShBase
        // the pair joins keep explicit shuffle_hash hints FOR MICRO
        // BATCHES: left to AQE they plan sort-merge and SORT the shingle
        // arrays per batch (measured +2.6 s on the sf0.1 gate when
        // tried); AQE still upgrades tiny sides to broadcast under the
        // hint. The hints sit on the CANDIDATE side (and the
        // candidates+sh1 intermediate), never on allSh: a shuffled hash
        // join cannot spill its build side, and allSh is corpus-sized
        // exactly when the semi filter declines — building it OOM'd the
        // 3.2M-doc steady-state probe. Catch-up batches drop the hints
        // entirely (microBatchHint): their candidate partitions can skew
        // past task memory behind one hub id.
        val pairs = microBatchHint(cands)
          .join(allSh.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
        val pairs2 = microBatchHint(pairs)
          .join(allSh.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
          .withColumn("j", Dedup.jaccardSortedCol(col("sh1"), col("sh2")))
          .where(col("j") >= threshold)
          .select(col("id1"), col("id2"), round(col("j"), 6).as("jaccard"))

        // each dataset's commit is independently idempotent on batchId: a
        // crash after some of the three published replays to exactly the
        // missing ones (the self-pair guard covers the index-before-pairs
        // interleavings)
        def commit(df: DataFrame, dataset: String): Unit = batchId match {
          case Some(b) => CommitLog.append(df, s"$workDir/$dataset", b): Unit
          case None => CommitLog.appendAlways(df, s"$workDir/$dataset")
        }
        // the three datasets are independent logs, so their commit jobs
        // run CONCURRENTLY (guide-§2.6 overlap): the two projection
        // writes (bands/shingles, reads of the persisted base) back-fill
        // executors while the verify pipeline's write finishes its tail.
        // Replay correctness never depended on commit ORDER — each
        // append is atomic + idempotent per batchId, and the self-pair
        // guard already covers index-before-pairs interleavings.
        // ONLY when batchId is defined (ADVICE r18): the batchId-less
        // mode commits via appendAlways (at-least-once, NOT idempotent),
        // and concurrent commits there widen a partial failure from
        // "an ordered prefix committed" to "any subset committed" —
        // a caller retry then duplicate-appends datasets whose reads
        // are not all defensively deduped (only pairs is). Sequential
        // order restores the documented prefix semantics.
        val commits = Seq(
          () => commit(pairs2, "pairs"),
          () => commit(newBands, "bands"),
          () => commit(newSh, "shingles"))
        if (batchId.isDefined) parallelUnits(commits)
        else commits.foreach(_.apply())
        def bytesOf(dir: String, fs: Seq[String]): Long =
          fs.map(f => new java.io.File(s"$dir/$f").length).sum
        BatchStats(replayed = false,
          bandFiles.size, allBandFiles.size,
          bytesOf(bandsDir, bandFiles), bytesOf(bandsDir, allBandFiles),
          shFilesSel.size, shFilesAll.size,
          bytesOf(shinglesDir, shFilesSel), bytesOf(shinglesDir, shFilesAll))
      } finally { if (persistCands) cands.unpersist(): Unit }
    } finally base.unpersist()
  }

  /** Read back the accumulated confirmed pairs. The streaming path is
    * exactly-once (commit-log replay skip), so the distinct() only
    * defends the batchId-less [[processBatch]] mode.
    */
  def pairs(spark: SparkSession, workDir: String): DataFrame =
    CommitLog.read(spark, s"$workDir/pairs").distinct()

  /** `bandsPartitions` sentinel: follow `indexPartitions` (the pre-r17
    * default behavior).
    */
  val FollowIndexPartitions: Int = TieredCompaction.FollowIndexPartitions

  /** `bandsPartitions` sentinel: pick the bands layout from MEASURED
    * on-disk sizes — see [[compactIndex]].
    */
  val AutoLayout: Int = TieredCompaction.AutoLayout

  /** AUTO layout trips to the hybrid (id-sorted) bands layout when the
    * bucket-hash partitioned rewrite inflates the input bytes past this
    * ratio. Measured regime (SCALING.md r16): the synthetic corpus
    * inflates ~9x (sigb dictionary locality lost); a corpus whose band
    * rows don't carry a compressible per-doc payload stays near 1x.
    * At 3x the partition prune needs to win back >2/3 of its reads to
    * break even — a trickle batch does, a nightly batch doesn't.
    */
  private[streaming] def AutoInflationRatio: Double = TieredCompaction.AutoInflationRatio

  /** Ceiling on minor-compaction tiers per dataset before [[compactIndex]]
    * forces a MAJOR (full) rewrite: each minor compaction adds one
    * fileset "tier" to the layout (readers union the tiers; the
    * partition prune is per-file, so correctness never depends on tier
    * count), and per-partition file opens grow with it.
    */
  val DefaultMaxTiers: Int = TieredCompaction.DefaultMaxTiers

  /** Per-dataset compaction telemetry returned by
    * [[compactIndexDetailed]] — see [[TieredCompaction.DatasetCompaction]].
    */
  type DatasetCompaction = TieredCompaction.DatasetCompaction

  /** Maintenance: compact the three commit-logged datasets (bands index,
    * shingles, pairs) into right-sized layouts — a stream appending a
    * few files per micro-batch reads progressively slower (listing +
    * open-file overhead scales with FILE COUNT) until compacted.
    *
    * INCREMENTAL BY DEFAULT (VERDICT r16 #1): once a dataset carries a
    * compacted base layout (its files ride `__p<modulus>=<k>/` partition
    * dirs), re-compaction folds ONLY the files appended since the last
    * compaction into a new TIER of the same layout and carries every
    * base file forward BY REFERENCE in the replace commit (the
    * [[SnapshotUpsert]] bucket-carry pattern) — nightly maintenance
    * cost is O(delta), not O(index). Readers union the tiers; the
    * per-file partition prune in [[processBatch]] is layout-generic, so
    * a probe reads `touched-partitions × tiers` files instead of the
    * whole index either way. Past `maxTiers` tiers (or when tiers mix
    * moduli after a partition-count change) the dataset takes one MAJOR
    * full rewrite back to a single tier — the classic L0→L1 schedule:
    * O(delta) minors amortize the rare O(index) major.
    *
    * `bandsPartitions` controls the bands-index layout:
    *   - `AutoLayout` (default): follow the existing base layout if one
    *     exists; otherwise write the bucket-hash partitioned layout,
    *     MEASURE its on-disk size against the input, and fall back to
    *     the hybrid id-sorted layout when it inflates past
    *     [[AutoInflationRatio]] (bucket-hash scatters each doc's band
    *     rows, so the per-doc sigb sketch stops dictionary-encoding —
    *     measured ~9x on the synthetic corpus, SCALING.md r16).
    *   - `FollowIndexPartitions`: bucket-hash at `indexPartitions`.
    *   - `1`: the hybrid nightly layout — band rows sorted by id
    *     (dictionary locality kept) under a `__p1=0/` marker dir, so
    *     later compactions still recognize the base and stay minor.
    *   - any other positive value: bucket-hash at that modulus.
    *
    * The shingles log always partitions on the id the verify joins
    * probe by (no inflation: one row per doc, nothing to scatter); the
    * pairs log compacts as id-sorted tiers. Each compaction publishes
    * as ONE transactional `replace` commit per dataset, so readers see
    * the old fileset or the new one, never a mix; superseded data dirs
    * vacuum only after the publish. Single-writer: run with the stream
    * quiesced. Returns dataset -> (filesBefore, filesAfter);
    * [[compactIndexDetailed]] exposes the full decision telemetry.
    */
  def compactIndex(
      spark: SparkSession,
      workDir: String,
      targetRecordsPerFile: Long = 5000000L,
      indexPartitions: Int = IndexPartitions,
      bandsPartitions: Int = AutoLayout,
      incremental: Boolean = true,
      maxTiers: Int = DefaultMaxTiers
  ): Map[String, (Long, Long)] =
    compactIndexDetailed(spark, workDir, targetRecordsPerFile, indexPartitions,
      bandsPartitions, incremental, maxTiers)
      .map { case (k, v) => k -> (v.filesBefore, v.filesAfter) }

  /** [[compactIndex]] with the full per-dataset decision telemetry. */
  def compactIndexDetailed(
      spark: SparkSession,
      workDir: String,
      targetRecordsPerFile: Long = 5000000L,
      indexPartitions: Int = IndexPartitions,
      bandsPartitions: Int = AutoLayout,
      incremental: Boolean = true,
      maxTiers: Int = DefaultMaxTiers
  ): Map[String, DatasetCompaction] = {
    require(maxTiers >= 1, s"maxTiers must be >= 1, got $maxTiers")
    // the three datasets are independent logs with independent replace
    // commits — compact them CONCURRENTLY (guide-§2.6 overlap; same
    // single-writer-per-dataset contract as before). Width is an ops
    // knob (VERDICT r18 #6): each compaction pipeline carries its own
    // shuffle/write footprint, so running all three at once trades
    // ~Nx the maintenance pass's peak memory envelope for the overlap —
    // cheap at fixture scale (MaintenanceEnvelopeProbe, 10x fixture,
    // warm-JIT alternation: peak heap ~13% over staged for ~40% less
    // wall time), but a memory-tight deployment can set
    // `spark.graft.streaming.maintenanceParallelism` to 2 or 1 to stage
    // the passes sequentially at the cost of idle tails.
    val width = spark.conf.getOption(MaintenanceParallelismConf)
      .map(_.toInt).getOrElse(3)
    val out = new java.util.concurrent.ConcurrentHashMap[String, DatasetCompaction]()
    parallelUnits(maxThreads = width, units = Seq(
      () => out.put("bands",
        TieredCompaction.compactKeyed(spark, s"$workDir/bands", targetRecordsPerFile,
          bandsPartitions match {
            case AutoLayout => AutoLayout
            case FollowIndexPartitions => indexPartitions
            case bp =>
              require(bp >= 1, s"bandsPartitions must be >= 1 or a sentinel, got $bp"); bp
          },
          keyCols = Seq("band", "bucket"), hybridSort = Seq("id"),
          incremental, maxTiers)): Unit,
      // the shingles log partitions on the id the verify joins probe by,
      // so per-batch verify reads prune to the partitions candidate ids
      // hash into (see the oldSh prune in [[processBatch]]); one row per
      // doc, so there is no locality to lose and no AUTO decision needed
      () => out.put("shingles",
        TieredCompaction.compactKeyed(spark, s"$workDir/shingles", targetRecordsPerFile,
          indexPartitions, keyCols = Seq("id"), hybridSort = Seq("id"),
          incremental, maxTiers)): Unit,
      // confirmed pairs: no probe joins read this by key, so it stays
      // the single-partition sorted layout — but tiered, so a nightly
      // re-compaction folds only the pairs appended since the last one
      () => out.put("pairs",
        TieredCompaction.compactKeyed(spark, s"$workDir/pairs", targetRecordsPerFile,
          1, keyCols = Seq("id1", "id2"), hybridSort = Seq("id1", "id2"),
          incremental, maxTiers)): Unit))
    Map("bands" -> out.get("bands"), "shingles" -> out.get("shingles"),
      "pairs" -> out.get("pairs"))
  }

}
