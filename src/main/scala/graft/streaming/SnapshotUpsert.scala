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
  * ([[Upsert.mergeLatest]]'s map-side-collapsed aggregate). Rewriting
  * the full snapshot per batch is the parquet-files cost of this
  * pattern — at real scale the snapshot is partitioned/bucketed by key
  * and only touched partitions rewrite.
  */
object SnapshotUpsert {

  /** Start maintaining `dir` from a STREAMING frame. `versionCol` must be
    * unique per key within any batch (the CDC contract). Deletes flow
    * through when `deleteCol` names a boolean column.
    */
  def maintain(
      stream: DataFrame,
      keys: Seq[String],
      versionCol: String,
      dir: String,
      deleteCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val spark = stream.sparkSession
    val schema = stream.schema
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$dir/v0")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cur = latestVersion(dir)
        val snap = spark.read.schema(schema).parquet(s"$dir/v$cur")
        // deletes must survive the merge itself (a late lower-version
        // change must not resurrect); drop tombstones only on read
        val merged = Upsert.mergeLatest(snap, batch, keys, versionCol, deleteCol = None)
        merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/v${cur + 1}")
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
