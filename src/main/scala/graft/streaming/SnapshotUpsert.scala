package graft.streaming

import graft.operators.Upsert

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuously-maintained keep-latest snapshot of a change stream —
  * the streaming half of [[graft.operators.Upsert]]: every micro-batch
  * merges into the previous snapshot version and writes a NEW immutable
  * version directory (`dir`/v0, v1, ...), so the stream never overwrites
  * what it is reading, failed batches leave the last good version
  * intact (the re-run merge is idempotent: max-version wins either
  * way), and past versions remain queryable — poor-man's time travel,
  * the same commit-chain idea a Delta/Iceberg sink formalizes. A real
  * deployment adds retention (delete v<n-K>) and compaction; the merge
  * logic would not change.
  *
  * Scale: each batch costs one key shuffle of snapshot ∪ batch
  * ([[Upsert.mergeLatest]]'s map-side-collapsed aggregate). Each version
  * is written RANGE-laid-out on the keys into
  * `ceil(rows / targetRecordsPerFile)` files — file count tracks
  * snapshot size (no single-task funnel, no small-file explosion) and
  * the in-file key sort keeps row-group min/max pruning alive for keyed
  * reads. Rewriting the full snapshot per batch is the parquet-files
  * cost of this pattern — at real scale the snapshot is
  * partitioned/bucketed by key and only touched partitions rewrite.
  */
object SnapshotUpsert {

  /** Start maintaining `dir` from a STREAMING frame. `versionCol` must be
    * unique per key within any batch (the CDC contract) and totally
    * ordered ACROSS batches: the merge is version-dominant
    * ([[Upsert.mergeLatest]] with `versionDominates`), so a late batch
    * carrying a lower version cannot overwrite a newer snapshot row or
    * resurrect a tombstone. Delete flags are ordinary columns here —
    * tombstones must SURVIVE the merge to keep winning their key — and
    * are filtered out by [[read]]'s `deleteCol`.
    */
  def maintain(
      stream: DataFrame,
      keys: Seq[String],
      versionCol: String,
      dir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      targetRecordsPerFile: Long = 5000000L
  ): StreamingQuery = {
    require(targetRecordsPerFile >= 1)
    val spark = stream.sparkSession
    val schema = stream.schema
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$dir/v0")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // single-writer: stale tmp dirs are debris from a crashed write —
        // no reader ever saw them (latestVersion only matches v\d+)
        Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith(".v-tmp-"))
          .foreach(deleteRecursively)
        val cur = latestVersion(dir)
        val snap = spark.read.schema(schema).parquet(s"$dir/v$cur")
        val merged = Upsert.mergeLatest(snap, batch, keys, versionCol,
          deleteCol = None, versionDominates = true)
          .persist() // one computation feeds both the count and the write
        try {
          val rows = merged.count()
          val nFiles = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
          // write to a tmp dir, then ATOMIC-rename into the version chain:
          // writing v{n+1} in place would make the directory visible (and
          // latestVersion-winning) BEFORE its files are complete — a crash
          // mid-write would leave a corrupt latest that the restarted
          // stream then merges into. The rename publishes all-or-nothing.
          val tmp = new java.io.File(dir, s".v-tmp-${java.util.UUID.randomUUID()}")
          merged
            .repartitionByRange(nFiles, keys.map(col): _*)
            .sortWithinPartitions(keys.map(col): _*)
            .write.mode("overwrite").parquet(tmp.getPath)
          require(tmp.renameTo(new java.io.File(dir, s"v${cur + 1}")),
            s"could not publish snapshot version v${cur + 1}")
        } finally merged.unpersist()
      }
      .trigger(trigger)
      .start()
  }

  /** Highest committed version number under `dir`. */
  def latestVersion(dir: String): Int = {
    val vs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
    if (vs.isEmpty) 0 else vs.max
  }

  /** Maintenance: retention + compaction — the step that keeps a
    * long-running snapshot chain from accreting unbounded version
    * directories and small files. Deletes every version older than the
    * newest `keepVersions` (bounding time travel to the retained window),
    * then rewrites the LATEST version into right-sized files via
    * [[graft.operators.Sink.compact]] (sorted by `sortBy` when given, so
    * row-group min/max pruning survives). Single-writer: run between
    * micro-batches / with the stream quiesced, like any table
    * maintenance job. Returns (versionsDeleted, filesBefore, filesAfter).
    */
  def vacuum(
      spark: SparkSession,
      dir: String,
      keepVersions: Int,
      targetRecordsPerFile: Long,
      sortBy: Seq[String] = Nil
  ): (Int, Long, Long) = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val latest = latestVersion(dir)
    val cutoff = latest - keepVersions + 1
    val deleted = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .filter(_.getName.drop(1).toInt < cutoff)
      .map { f => deleteRecursively(f); 1 }.sum
    val (before, after) =
      graft.operators.Sink.compact(spark, s"$dir/v$latest", targetRecordsPerFile, sortBy)
    (deleted, before, after)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Read a snapshot version (latest by default), tombstones removed. */
  def read(
      spark: SparkSession,
      dir: String,
      version: Int = -1,
      deleteCol: Option[String] = None
  ): DataFrame = {
    val v = if (version >= 0) version else latestVersion(dir)
    val df = spark.read.parquet(s"$dir/v$v")
    deleteCol match {
      case Some(d) => df.where(!col(d)).drop(d)
      case None => df
    }
  }
}
