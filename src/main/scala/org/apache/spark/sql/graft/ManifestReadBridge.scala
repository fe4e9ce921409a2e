package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Manifest-driven parquet reads (r18 optimization, the lakehouse
  * listing-avoidance pattern): a [[graft.streaming.CommitLog]] commit
  * already NAMES every live data file, yet reading them through
  * `spark.read.parquet(file1, ..., fileN)` rebuilt an
  * `InMemoryFileIndex` each time — for N past the parallel-discovery
  * threshold (32) that launches a whole Spark LISTING JOB per read
  * (measured 0.7–1.3 s per streaming-dedup batch at a few hundred
  * index files) just to re-stat paths the manifest owner can stat
  * driver-side in microseconds. This bridge plans the scan from the
  * caller-supplied `FileStatus`es directly: zero listing jobs, zero
  * directory walks, same `ParquetFileFormat` scan (pushdown, column
  * pruning, vectorized read all unchanged).
  *
  * In the `org.apache.spark.sql` namespace because `Dataset.ofRows`
  * and `LogicalRelation` are `private[sql]` — same shim rationale as
  * [[ColumnBridge]].
  */
object ManifestReadBridge {

  /** A FileIndex that serves a FIXED fileset: no filesystem access. */
  private final class ManifestFileIndex(files: Array[FileStatus]) extends FileIndex {
    override def rootPaths: Seq[Path] =
      files.iterator.map(_.getPath.getParent).distinct.toSeq
    override def listFiles(
        partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      Seq(PartitionDirectory(InternalRow.empty, files))
    override def inputFiles: Array[String] = files.map(_.getPath.toString)
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = files.map(_.getLen).sum
    override def partitionSchema: StructType = StructType(Nil)
  }

  /** DataFrame over exactly `paths` (local-FS absolute paths) with the
    * given schema — the caller (a commit-log owner) vouches the files
    * exist; lengths are stat'ed driver-side here, once.
    */
  def parquetFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      schema: StructType,
      paths: Seq[String]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val statuses = paths.map { p =>
      val f = new java.io.File(p)
      // fail FAST on a manifest-listed file missing on disk (ADVICE r18):
      // java.io.File.length() is 0 for a nonexistent path, so a pruned or
      // partially-restored data file would otherwise become a 0-length
      // status and a silently EMPTY scan — in a dedup index read that is
      // silently dropped committed data, where spark.read.parquet failed
      // loudly. The stat is already being performed; only the check is new.
      require(f.isFile, s"manifest-listed file missing on disk: $p")
      new FileStatus(f.length(), false, 1, 128L * 1024 * 1024, f.lastModified(),
        new Path(f.toURI))
    }.toArray
    val relation = HadoopFsRelation(
      new ManifestFileIndex(statuses),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(classic)
    org.apache.spark.sql.classic.Dataset.ofRows(classic, LogicalRelation(relation))
  }
}
