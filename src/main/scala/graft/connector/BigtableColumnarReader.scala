package graft.connector

import graft.model._
import graft.store.BigtableStores

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

import java.util.regex.Pattern

/** Vectorized (columnar) read path, opt-in via `vectorized=true`: the
  * same store read and cell→row pivot as [[BigtablePartitionReader]],
  * but decoded values land DIRECTLY in `OnHeapColumnVector`s — no
  * per-row `GenericInternalRow` allocation, no per-field boxing — and
  * Spark consumes whole `ColumnarBatch`es (the scan feeds whole-stage
  * codegen through a vectorized ColumnarToRow, the same shape as the
  * built-in parquet reader). The reference pivots to a columnar Arrow
  * `RecordBatch` the same way, but materializes the ENTIRE result as
  * one batch (execute_plan.rs:186-307); here batches are bounded at
  * `batchSize` rows so memory stays flat at any scan volume.
  *
  * Emission order is identical to the row reader ((rowKey, timestamp)
  * ascending per partition) — `SupportsReportOrdering` stays truthful
  * in both modes.
  */
final class BigtableColumnarPartitionReader(
    cfg: BigtableConfig,
    readSchema: StructType,
    rowFilters: Seq[RowFilter],
    ranges: Seq[RowRange],
    tsRange: Option[(Long, Long)],
    limit: Option[Int] = None,
    shippedStore: Option[graft.store.BigtableStore] = None,
    batchSize: Int = 4096
) extends PartitionReader[ColumnarBatch] {

  private val sepPattern = Pattern.quote(cfg.separator)
  private val fields = readSchema.fields

  private sealed trait FieldSrc
  private case class KeyPart(i: Int) extends FieldSrc
  private case object Ts extends FieldSrc
  private case class Qual(family: String, name: String, dt: DataType) extends FieldSrc
  private val plan: Array[FieldSrc] = fields.map { f =>
    if (f.name == BigtableConfig.TimestampCol) Ts
    else {
      val ki = cfg.partitionCols.indexOf(f.name)
      if (ki >= 0) KeyPart(ki) else Qual(cfg.familyOf(f.name), f.name, f.dataType)
    }
  }

  /** Source iterator: one (BtRow, distinct cell ts, cells-at-ts) pivot
    * group per output row, same grouping as the row reader.
    */
  private val groupIter: Iterator[(Array[String], Long, Map[(String, String), Seq[BtCell]])] = {
    val rows =
      if (ranges.isEmpty) Iterator.empty
      else
        BigtableStores
          .resolve(cfg.storeName, shippedStore)
          .readRows(cfg.table, ranges, rowFilters)
    val base = rows.flatMap { row =>
      val keyParts: Array[String] =
        if (cfg.partitionCols.size == 1) Array(row.rowKey)
        else {
          val parts = row.rowKey.split(sepPattern, -1)
          if (parts.length != cfg.partitionCols.size)
            throw new IllegalStateException(
              s"row key '${row.rowKey}' does not split into ${cfg.partitionCols.size} components " +
                s"with separator '${cfg.separator}'")
          parts
        }
      val cellsInWindow = tsRange match {
        case None           => row.cells
        case Some((lo, hi)) => row.cells.filter(c => c.timestampMicros > lo && c.timestampMicros <= hi)
      }
      cellsInWindow.groupBy(_.timestampMicros).toArray.sortBy(_._1).iterator.map {
        case (ts, cells) => (keyParts, ts, cells.groupBy(c => (c.family, c.qualifier)))
      }
    }
    limit.fold(base)(base.take)
  }

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, readSchema)
  private val batch = new ColumnarBatch(vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))

  override def next(): Boolean = {
    if (!groupIter.hasNext) return false
    vectors.foreach(_.reset())
    var n = 0
    while (n < batchSize && groupIter.hasNext) {
      val (keyParts, ts, byQual) = groupIter.next()
      var i = 0
      while (i < plan.length) {
        plan(i) match {
          case KeyPart(ki) =>
            val b = keyParts(ki).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            vectors(i).putByteArray(n, b, 0, b.length)
          case Ts => vectors(i).putLong(n, ts)
          case Qual(fam, name, dt) =>
            byQual.get((fam, name)).map(_.head.value) match {
              case None => vectors(i).putNull(n)
              case Some(bytes) =>
                dt match {
                  case LongType =>
                    CellCodec.decodeLong(bytes) match {
                      case Some(v) => vectors(i).putLong(n, v)
                      case None    => vectors(i).putNull(n)
                    }
                  case DoubleType =>
                    // reference convention: floats stored as UTF-8
                    // strings (datasource.rs:188-189)
                    CellCodec.decodeString(bytes).flatMap(_.toDoubleOption) match {
                      case Some(v) => vectors(i).putDouble(n, v)
                      case None    => vectors(i).putNull(n)
                    }
                  case _ =>
                    CellCodec.decodeString(bytes) match {
                      case Some(s) =>
                        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                        vectors(i).putByteArray(n, b, 0, b.length)
                      case None => vectors(i).putNull(n)
                    }
                }
            }
        }
        i += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = batch.close()
}
