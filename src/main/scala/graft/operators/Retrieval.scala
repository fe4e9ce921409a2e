package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
      corpusSize: Option[Long] = None,
      requireAll: Boolean = false
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
    val scored = tf.join(broadcast(dfreq), "__t")
      .groupBy(col(idCol))
      .agg(sum(col("__tf") * idf).as("score"),
        count(lit(1)).as("__nt")) // tf has one row per (doc, term)
    // requireAll = conjunctive (AND) retrieval: keep only documents
    // containing EVERY query term — the same aggregate, one extra
    // HAVING-style filter, no additional pass
    (if (requireAll) scored.where(col("__nt") === terms.size) else scored)
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }

  private val BucketCol = "__b"
  private val BucketRe = "__b=(\\d+)/".r.unanchored

  /** Materialize the corpus's inverted index — (doc, term, tf) posting
    * rows hash-bucketed by TERM — as a [[graft.streaming.CommitLog]]
    * table, so repeated queries probe the index instead of re-tokenizing
    * the corpus ([[termSearch]] pays that scan on every call; right once,
    * wrong for a query workload at 100 TB).
    *
    * Layout: ONE corpus scan + one (doc, term) count shuffle, then the
    * posting rows land in `numBuckets` files partitioned by
    * `pmod(xxhash64(term), numBuckets)` and sorted by term within each —
    * every occurrence of a term lives in exactly one bucket, so a k-term
    * query reads k files (and parquet row-group min/max on the sorted
    * term column prunes inside them), and df(term) is computable from
    * the probed bucket alone. The corpus document count N is recorded in
    * the table metadata so scoring never re-counts. Published as one
    * atomic replace commit: rebuilds swap in transactionally and readers
    * never see a half-written index.
    */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      numBuckets: Int = 64
  ): Unit = {
    require(numBuckets >= 1)
    val spark = docs.sparkSession
    val n = docs.count()
    val tf = docs
      .select(col(idCol).as("doc"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val bucketOf = pmod(xxhash64(col("term")), lit(numBuckets.toLong)).cast("int")
    CommitLogAccess.publishBucketed(
      tf.withColumn(BucketCol, bucketOf), BucketCol, numBuckets, dir,
      meta = s"""{"numBuckets":$numBuckets,"corpusSize":$n}""")
  }

  /** Add NEW documents' postings to an existing index as ONE append
    * commit in the same bucket layout — incremental maintenance for a
    * growing corpus: the delta is tokenized once (delta-sized, never a
    * base re-scan), [[indexSearch]] transparently folds base + deltas
    * because every commit's files carry the bucket in their path, and
    * the recorded corpus size advances for the idf weights.
    *
    * Contract: `newDocs` ids must be NEW (a document split across base
    * and delta would hold two posting rows per term and be df-counted
    * twice). Each append adds one file per touched bucket; run
    * [[compactIndex]] when the per-bucket file count grows past the
    * read-amplification you want (the standard LSM bargain).
    */
  def appendToIndex(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      batchId: Option[Long] = None,
      numBucketsIfNew: Int = 64
  ): Unit = {
    val (nb, n) = CommitLogAccess.readMetaOrInit(dir, numBucketsIfNew)
    // exactly-once for a checkpointed stream: a replayed micro-batch's
    // commit is already in the log — skip it (and the corpus-count
    // advance) entirely
    if (batchId.exists(graft.streaming.CommitLog.isCommitted(dir, _))) return
    val added = newDocs.count()
    if (added == 0) return
    val tf = newDocs
      .select(col(idCol).as("doc"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val bucketOf = pmod(xxhash64(col("term")), lit(nb.toLong)).cast("int")
    CommitLogAccess.publishBucketed(
      tf.withColumn(BucketCol, bucketOf), BucketCol, nb, dir,
      meta = s"""{"numBuckets":$nb,"corpusSize":${n + added}}""",
      replace = false, batchId = batchId)
    // bound the manifest walk on a long-running stream the same way
    // CommitLog.append does — fold the tail periodically (batch ids are
    // preserved by the checkpoint, so replay-skip survives folding)
    if (batchId.exists(b => b % 32 == 31)) graft.streaming.CommitLog.checkpoint(dir): Unit
  }

  /** Continuous EXACTLY-ONCE index maintenance from a STREAMING document
    * frame: every micro-batch's postings land as one batch-keyed append
    * commit ([[appendToIndex]]), so crash-replays are skipped, searches
    * always see whole commits, and the index trails the corpus by at
    * most one micro-batch. `checkpoint` is REQUIRED — batch ids are only
    * meaningful relative to a query checkpoint (the [[graft.streaming.CommitLog.sink]]
    * rule). Run [[compactIndex]] periodically (quiesced) to fold the
    * per-batch bucket files.
    */
  def indexSink(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      checkpoint: String,
      numBuckets: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()
  ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        appendToIndex(batch, idCol, textCol, dir, Some(bid), numBucketsIfNew = numBuckets)
      }
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Tiered (O(delta)) index maintenance via
    * [[graft.streaming.TieredCompaction.compactKeyed]] — the same L0→L1
    * schedule the dedup indexes run, keyed on `term`:
    *
    *  - MINOR (the steady state): folds ONLY the `__b=<k>/` posting
    *    files appended since the last compaction into one new
    *    `__p<numBuckets>=<k>/` tier of the base layout and carries every
    *    base file forward BY REFERENCE in the replace commit.
    *    Maintenance cost is O(delta), never O(postings) — at the 100 TB
    *    north star the posting table is corpus-scale, so a nightly
    *    full-postings rewrite was the one remaining O(index) path
    *    (VERDICT r17 #2).
    *  - MAJOR (first compaction, tier count past `maxTiers`, or
    *    `incremental = false`): the rare full rewrite to a single tier
    *    that bounds per-bucket file counts, amortized across `maxTiers`
    *    minors.
    *
    * Both conventions hash a term with `pmod(xxhash64(term),
    * numBuckets)`, so [[indexSearch]]'s probe prunes append files and
    * compacted tiers with the same touched set. Atomic like every
    * commit: one replace publish, vacuum after.
    */
  def compactIndex(
      spark: SparkSession,
      dir: String,
      targetRecordsPerFile: Long = 5000000L,
      incremental: Boolean = true,
      maxTiers: Int = graft.streaming.TieredCompaction.DefaultMaxTiers
  ): graft.streaming.TieredCompaction.DatasetCompaction = {
    val (nb, _) = CommitLogAccess.readMeta(dir)
    graft.streaming.TieredCompaction.compactKeyed(
      spark, dir, targetRecordsPerFile,
      partitions = graft.streaming.TieredCompaction.AutoLayout,
      keyCols = Seq("term"), hybridSort = Seq("term"),
      incremental = incremental, maxTiers = maxTiers,
      // no existing base to follow -> the index's own bucket modulus,
      // keeping the probe's one-touched-set prune exact across layouts
      autoDefault = nb)
  }

  /** [[termSearch]] semantics (same integer score, same ordering, same
    * no-zero-score contract) served from a [[buildIndex]] table: reads
    * ONLY the buckets the query's terms hash to — the corpus is never
    * touched. Exact, not approximate: every posting row of every query
    * term is in the probed files.
    */
  def indexSearch(
      spark: SparkSession,
      dir: String,
      query: Seq[String],
      topK: Int,
      requireAll: Boolean = false
  ): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    require(topK >= 1)
    val (numBuckets, n) = CommitLogAccess.readMeta(dir)
    val terms = query.map(_.toLowerCase).distinct
    // the terms' bucket ids, via the same Spark hash the writer used —
    // k rows, computed locally, never a corpus job
    val touched = spark.createDataset(terms)(org.apache.spark.sql.Encoders.STRING)
      .select(pmod(xxhash64(col("value")), lit(numBuckets.toLong)).cast("int").as("b"))
      .collect().map(_.getInt(0)).toSet
    // two file-layout generations coexist: append commits carry
    // `__b=<k>/` dirs, compacted tiers carry TieredCompaction's
    // `__p<modulus>=<k>/` dirs — the SAME pmod(xxhash64(term), nb)
    // value in both, so one touched set prunes both (and the hybrid
    // `__p1=0/` small-index layout, whose modulus the probe did not
    // compute, is never pruned — row-group min/max on the sorted term
    // column prunes inside it instead)
    val files = graft.streaming.TieredCompaction.pruneFiles(
      graft.streaming.CommitLog.currentFiles(dir).filter { f =>
        BucketRe.findFirstMatchIn(f).forall(m => touched.contains(m.group(1).toInt))
      },
      Map(numBuckets -> touched))
    val schema = graft.streaming.CommitLog.schemaOf(dir)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          schema("doc"),
          org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.LongType))))
    val tf = graft.streaming.CommitLog.readFiles(spark, dir, schema, files)
      .where(col("term").isInCollection(terms))
    // df per term from the probed postings (complete by bucketing); tiny
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val idf = ((lit(n) - pmod(lit(n), col("__df"))) / col("__df")).cast("long")
    val scored = tf.join(broadcast(dfreq), "term")
      .groupBy(col("doc"))
      .agg(sum(col("tf") * idf).as("score"),
        countDistinct(col("term")).as("__nt")) // distinct, not row count:
        // defensive against a doc's postings ever splitting across commits
    (if (requireAll) scored.where(col("__nt") === terms.size) else scored)
      .select(col("doc"), col("score"))
      .orderBy(desc("score"), col("doc"))
      .limit(topK)
  }
}

/** The small shared surface [[Retrieval]] needs from the commit log:
  * bucket-partitioned publish and metadata. Kept next to the operator so
  * the log stays a generic table protocol.
  */
private[operators] object CommitLogAccess {
  import java.nio.charset.StandardCharsets
  import java.nio.file.{Files, Paths}

  /** Write `df` partitioned by `bucketCol` under data/<uuid>/ and publish
    * the fileset as one atomic commit (`replace` supersedes the previous
    * fileset; append adds to it), with `meta` JSON recorded beside the
    * schema. The meta write precedes the commit: on a crash between the
    * two the table keeps its old fileset with an advanced corpus count —
    * an idf perturbation, never a wrong posting. Sidecar state that MUST
    * stay consistent with the fileset (e.g. the IVF centroids the row
    * buckets were derived from) goes in `extraFiles`: written into the
    * same data/<uuid>/ dir BEFORE the commit, so the atomic manifest
    * rename publishes data and sidecar together — a crash in between
    * leaves only an orphaned, unreferenced uuid dir.
    */
  def publishBucketed(
      df: DataFrame, bucketCol: String, numBuckets: Int, dir: String, meta: String,
      replace: Boolean = true, sortCols: Seq[String] = Seq("term"),
      batchId: Option[Long] = None, extraFiles: Seq[(String, String)] = Nil): Unit = {
    graft.streaming.CommitLog.init(dir, df.drop(bucketCol).schema)
    writeMetaAtomically(dir, meta)
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = s"$dir/data/$uuid"
    df.repartition(numBuckets, col(bucketCol))
      .sortWithinPartitions((bucketCol +: sortCols).map(col): _*)
      .write.partitionBy(bucketCol).parquet(dataDir)
    extraFiles.foreach { case (name, contents) =>
      Files.write(Paths.get(dataDir, name), contents.getBytes(StandardCharsets.UTF_8)): Unit
    }
    val prefix = Paths.get(dir).toAbsolutePath
    val files = Option(new java.io.File(dataDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$bucketCol="))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => prefix.relativize(f.toPath.toAbsolutePath).toString)
      .sorted.toSeq
    graft.streaming.CommitLog.commitFiles(dir, files, replace = replace, batchId = batchId): Unit
  }

  /** tmp + ATOMIC_MOVE, the CommitLog metadata discipline: a crash
    * mid-write must leave either the old meta or the new one, never a
    * torn _index.json that bricks every later readMeta.
    */
  private def writeMetaAtomically(dir: String, meta: String): Unit = {
    val tmp = Paths.get(dir, s".tmp-meta-${java.util.UUID.randomUUID()}")
    Files.write(tmp, meta.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, "_index.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** (numBuckets, corpusSize) recorded at build time. */
  def readMeta(dir: String): (Int, Long) = {
    val txt = new String(Files.readAllBytes(Paths.get(dir, "_index.json")), StandardCharsets.UTF_8)
    val nb = "\"numBuckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"corrupt index meta in $dir"))
    val n = "\"corpusSize\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"corrupt index meta in $dir"))
    (nb, n)
  }

  /** [[readMeta]], creating an empty table with `numBuckets` when none
    * exists yet — the from-scratch entry for a streamed corpus.
    */
  def readMetaOrInit(dir: String, numBuckets: Int): (Int, Long) = {
    val p = Paths.get(dir, "_index.json")
    if (!Files.exists(p)) {
      Files.createDirectories(Paths.get(dir))
      writeMetaAtomically(dir, s"""{"numBuckets":$numBuckets,"corpusSize":0}""")
    }
    readMeta(dir)
  }
}
