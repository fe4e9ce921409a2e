package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output side of a training-data pipeline: layout-controlled parquet.
  *
  * At 100 TB the write layout decides every downstream read: partition
  * directories give coarse pruning (`WHERE lang = 'en'` skips whole
  * directories), in-file sort gives min/max row-group pruning on the
  * sort key, and one shuffle before the write bounds file counts
  * (`files = partitions x distinct partition values` without it).
  */
object Sink {

  /** Write `df` as partitioned parquet: one hash shuffle on the
    * partition columns (so each partition value is written by as few
    * tasks as possible — no small-file explosion), sorted within tasks
    * by `sortBy` (row-group min/max pruning on those columns), capped
    * at `maxRecordsPerFile` (bounds file sizes under data skew: a hot
    * partition value rolls into multiple files instead of one huge one).
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String],
      sortBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L
  ): Unit = {
    require(partitionBy.nonEmpty, "partitionBy must name at least one column")
    val shuffled = df.repartition(partitionBy.map(col): _*)
    val sorted =
      if (sortBy.isEmpty) shuffled
      else shuffled.sortWithinPartitions((partitionBy ++ sortBy).map(col): _*)
    sorted.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** Read back a [[writePartitioned]] dataset with the partition
    * columns restored to the requested types (directory-encoded values
    * come back as inferred types; a pipeline wants the declared ones).
    */
  def readPartitioned(spark: SparkSession, path: String, partitionTypes: (String, String)*): DataFrame =
    partitionTypes.foldLeft(spark.read.parquet(path)) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t))
    }

  /** Write `df` RANGE-laid-out on `rangeBy`: `repartitionByRange`
    * (sampled range boundaries, one shuffle) puts each output file in
    * charge of a narrow DISJOINT key range, and the in-partition sort
    * orders rows inside every row group. A later range predicate on the
    * layout key then touches only the few files whose range overlaps,
    * and parquet's footer min/max statistics skip every other row group
    * at scan time — on a 100 TB corpus a `doc_id BETWEEN …` or
    * time-range read becomes proportional to the SELECTED data, not the
    * table (the same reason time-series tables are stored
    * time-clustered). `rowGroupBytes` bounds row-group size so skipping
    * stays fine-grained even inside large files.
    *
    * Range layout vs [[writePartitioned]]: partition directories prune
    * on LOW-cardinality columns (lang, date); range layout clusters on
    * HIGH-cardinality orderable keys where one-directory-per-value
    * would explode the file count.
    */
  def writeRangeLayout(
      df: DataFrame,
      path: String,
      rangeBy: Seq[String],
      nRanges: Int,
      rowGroupBytes: Long = 128L * 1024 * 1024
  ): Unit = {
    require(rangeBy.nonEmpty, "rangeBy must name at least one column")
    require(nRanges >= 1)
    df.repartitionByRange(nRanges, rangeBy.map(col): _*)
      .sortWithinPartitions(rangeBy.map(col): _*)
      .write
      .mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Morton (Z-order) value: bit-interleave the `bits`-bit ranks of the
    * given columns (rank = position of the value inside [min, max],
    * scaled to 2^bits buckets). Interleaving makes points close in ALL
    * dimensions close in z — the multi-column generalization of range
    * clustering. Pure codegen'd bit arithmetic: `bits * cols.size` OR
    * terms, linear expression tree.
    */
  def zOrderValue(cols: Seq[org.apache.spark.sql.Column], mins: Seq[Long], maxs: Seq[Long], bits: Int): org.apache.spark.sql.Column = {
    val k = cols.size
    require(k >= 2, "z-order needs at least two columns (use writeRangeLayout for one)")
    require(bits * k <= 63, s"bits=$bits x ${k} columns exceeds a 64-bit z-value")
    val buckets = 1L << bits
    val ranks = cols.zip(mins.zip(maxs)).map { case (c, (mn, mx)) =>
      val span = (mx - mn + 1).toDouble
      least(
        greatest(floor((c.cast("double") - mn) / span * buckets).cast("long"), lit(0L)),
        lit(buckets - 1))
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      ranks.zipWithIndex.foldLeft(acc) { case (a, (r, j)) =>
        a.bitwiseOR(shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + j))
      }
    }
  }

  /** Write `df` Z-ORDER-clustered on `zBy` (2+ numeric columns): rows are
    * range-partitioned and sorted by their interleaved-bit Morton value,
    * so every file and row group covers a small HYPER-RECTANGLE of the
    * key space — parquet footer min/max statistics then skip row groups
    * for selective predicates on ANY of the z columns, not just a single
    * sort key. The multi-dimensional analogue of [[writeRangeLayout]]:
    * range layout makes one column's reads proportional to selection;
    * z-order splits that power across the column set (each dimension
    * prunes with ~bits/k of the resolution), the standard layout for
    * "filter by time AND tenant AND key" fact tables at 100 TB.
    *
    * One pass computes per-column min/max (two longs per column to the
    * driver), one shuffle lays the data out; the z column itself is
    * dropped from the files — readers filter on the natural columns and
    * pruning falls out of the footer stats.
    */
  def writeZOrder(
      df: DataFrame,
      path: String,
      zBy: Seq[String],
      nRanges: Int,
      bits: Int = 16,
      rowGroupBytes: Long = 128L * 1024 * 1024
  ): Unit = {
    require(nRanges >= 1)
    val statExprs = zBy.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val statsRow = df.agg(statExprs.head, statExprs.tail: _*).head()
    val mins = zBy.indices.map(i => statsRow.getLong(2 * i))
    val maxs = zBy.indices.map(i => statsRow.getLong(2 * i + 1))
    df.withColumn("__z", zOrderValue(zBy.map(col), mins, maxs, bits))
      .repartitionByRange(nRanges, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Write `df` as a BUCKETED catalog table: rows hash-distribute into
    * `nBuckets` files per write task by `bucketCols`, sorted inside each
    * bucket. Two tables bucketed the same way join WITHOUT a shuffle —
    * the exchange that dominates a fact-fact join at 100 TB disappears
    * because the partitioning is persisted with the data and reused
    * across every downstream stage (the strategy Hive/Iceberg pipelines
    * use for repeatedly-joined fact tables).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    require(bucketCols.nonEmpty && nBuckets >= 1)
    // the stale-location cleanup below assumes <warehouse>/<table> in the
    // default database; a qualified name (db.tbl) would both break the
    // backticked DROP and point the delete at the wrong path — reject it
    require(!table.contains('.'),
      s"writeBucketed requires an unqualified table name in the default database, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the default (in-memory) catalog forgets tables across sessions but
    // their files persist in the warehouse; a stale location fails
    // saveAsTable with LOCATION_ALREADY_EXISTS — clear it first. Only a
    // LOCAL warehouse can hold such orphans across JVMs; never touch a
    // remote (hdfs/s3) warehouse with java.io.File semantics.
    val whRaw = spark.conf.get("spark.sql.warehouse.dir")
    if (!whRaw.contains(":/") || whRaw.startsWith("file:"))
      deleteRecursively(new java.io.File(whRaw.stripPrefix("file:"), table.toLowerCase))
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.saveAsTable(table)
  }

  /** Small-file compaction — the table-maintenance pass every streaming
    * or incremental sink eventually needs: rewrite a parquet directory
    * into `ceil(rows / targetRecordsPerFile)` right-sized files
    * (optionally re-sorted so row-group min/max stats survive the
    * rewrite), then atomically swap directories. Metadata/listing cost
    * and open-file overhead at read time scale with FILE COUNT, not
    * bytes — a snapshot that accretes one file per micro-batch
    * ([[graft.streaming.SnapshotUpsert]]) reads progressively slower
    * until compacted. The local-FS swap is two renames — NEAR-atomic,
    * single-writer, readers quiesced: between staging the live directory
    * aside and renaming the rewrite in there is a window where the path
    * is briefly absent (a crash in that window is repaired here by
    * restoring the staged original). A real lakehouse makes the swap a
    * transactional metadata commit so readers never see the gap; the
    * rewrite itself is identical. Returns (filesBefore, filesAfter).
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetRecordsPerFile: Long,
      sortBy: Seq[String] = Nil
  ): (Long, Long) = {
    require(targetRecordsPerFile >= 1)
    require(!path.contains(":/") || path.startsWith("file:"),
      "rename-swap compaction supports local paths only; use a transactional sink for object stores")
    val local = path.stripPrefix("file:")
    val df = spark.read.parquet(local)
    val rows = df.count()
    val filesBefore = countParquetFiles(local)
    val nFiles = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val shaped =
      if (sortBy.nonEmpty)
        df.repartitionByRange(nFiles, sortBy.map(col): _*).sortWithinPartitions(sortBy.map(col): _*)
      else df.repartition(nFiles)
    val tmp = local + ".compact-tmp"
    val old = local + ".compact-old"
    shaped.write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(local)
    val oldDir = new java.io.File(old)
    deleteRecursively(oldDir)
    require(dir.renameTo(oldDir), s"could not stage $local aside")
    // if the swap-in fails, restore the staged original so the live path
    // never stays missing (data stranded in .compact-old)
    if (!new java.io.File(tmp).renameTo(dir)) {
      val restored = oldDir.renameTo(dir)
      throw new IllegalStateException(
        s"could not swap compacted files into $local" +
          (if (restored) " (original restored)" else s" AND could not restore $old — recover manually"))
    }
    deleteRecursively(oldDir)
    (filesBefore, countParquetFiles(local))
  }

  private def countParquetFiles(dir: String): Long =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet")).toLong

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
