package graft.connector

import graft.model._

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** Vectorized (columnar) read path, opt-in via `vectorized=true`: the
  * same store read and cell→row pivot as [[BigtablePartitionReader]] —
  * literally the same code, both readers consume
  * [[BigtablePivot.groups]]/[[BigtablePivot.extract]] — but decoded
  * values land DIRECTLY in `OnHeapColumnVector`s (no per-row
  * `GenericInternalRow` allocation) and Spark consumes whole
  * `ColumnarBatch`es (the scan feeds whole-stage codegen through a
  * vectorized ColumnarToRow, the same shape as the built-in parquet
  * reader). The reference pivots to a columnar Arrow `RecordBatch` the
  * same way, but materializes the ENTIRE result as one batch
  * (execute_plan.rs:186-307); here batches are bounded at `batchSize`
  * rows so memory stays flat at any scan volume.
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
    batchSize: Int = 4096,
    postFilter: Option[BigtablePivot.Group => Boolean] = None
) extends PartitionReader[ColumnarBatch] {

  require(batchSize > 0,
    s"vectorizedBatchSize must be positive, got $batchSize (a non-positive batch would " +
      "silently truncate the scan to zero rows)")

  private val plan = BigtablePivot.fieldPlan(cfg, readSchema)

  private val groupIter: BigtablePivot.GroupIterator =
    BigtablePivot.groups(cfg, rowFilters, ranges, tsRange, limit, shippedStore, postFilter)

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, readSchema)
  private val batch = new ColumnarBatch(vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))

  override def next(): Boolean = {
    if (!groupIter.hasNext) return false
    vectors.foreach(_.reset())
    var n = 0
    while (n < batchSize && groupIter.hasNext) {
      val g = groupIter.next()
      var i = 0
      while (i < plan.length) {
        // shared boxed extraction (identical to the row reader), then an
        // unbox into the vector — the win here is no per-row row object,
        // and LongType/DoubleType decode already boxes via Option anyway
        BigtablePivot.extract(plan(i), g) match {
          case null          => vectors(i).putNull(n)
          case v: Long       => vectors(i).putLong(n, v)
          case v: Double     => vectors(i).putDouble(n, v)
          case s: UTF8String =>
            val b = s.getBytes
            vectors(i).putByteArray(n, b, 0, b.length)
          case other =>
            throw new IllegalStateException(s"unexpected decoded value type: ${other.getClass}")
        }
        i += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    groupIter.close() // release a partially-consumed store scan (socket)
    batch.close()
  }
}
