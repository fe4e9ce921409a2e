package graft.store

import graft.model._

import java.util.concurrent.{ConcurrentHashMap, ConcurrentSkipListMap}
import scala.jdk.CollectionConverters._

/** A [[BigtableStore]] that also accepts writes — the `MutateRows` RPC
  * surface of the Bigtable data API, which the read-only reference
  * never exposes (its insert path is an offline Python script,
  * /root/reference/script/insert_rows.py). Each cell is a SetCell
  * UPSERT addressed by `(rowKey, family, qualifier, timestampMicros)`:
  * writing the same coordinates twice replaces the value, which is what
  * makes Spark task retries safe — a re-executed writer task re-sets
  * identical cells instead of duplicating them (the idempotence real
  * Bigtable gives timestamp-pinned mutations).
  */
trait MutableBigtableStore extends BigtableStore {

  /** Apply one batch of row mutations: for each `(rowKey, cells)`,
    * upsert every cell at its own coordinates. A batch is NOT atomic
    * across rows (Bigtable MutateRows semantics) — only idempotent.
    */
  def mutateRows(table: String, mutations: Seq[(String, Seq[BtCell])]): Unit

  /** Drop every row of `table` (the admin API's DropRowRange over the
    * whole table) — the truncate behind `mode("overwrite")`.
    */
  def truncateTable(table: String): Unit
}

/** Thread-safe mutable Bigtable emulator: tables are concurrent
  * skip-list maps in UTF-8-byte key order (so range reads stream in
  * Bigtable key order without a sort), rows are concurrent maps from
  * cell coordinates to value (so concurrent writer tasks interleave
  * safely and SetCell idempotence is structural). Reads see a live,
  * weakly-consistent view — matching the non-transactional reality of
  * reading a table that is being written.
  */
final class ConcurrentBigtable extends MutableBigtableStore {

  private type Row = ConcurrentHashMap[(String, String, Long), Array[Byte]]
  private val tables =
    new ConcurrentHashMap[String, ConcurrentSkipListMap[String, Row]]()

  /** O(1) whole-table statistics ledger, maintained by the write path:
    * (rowCount, cellBytes) per table. Without it every `estimateSize` /
    * `sampleRowKeys` on a full-scan table walks the entire skip list
    * single-threaded on the DRIVER at planning time — a per-query cost
    * that grows linearly with table size (the r12 `stream_bt_write`
    * scaling outlier: the timed query is a small read-back, the O(N)
    * planning walk was the part that grew). Byte accounting mirrors
    * `estimateSize`'s formula exactly (key.length on row creation,
    * 16 + qualifier + value per live cell, adjusted on overwrite).
    */
  private final class Ledger {
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
  }
  private val ledgers = new ConcurrentHashMap[String, Ledger]()

  private def newTable(): ConcurrentSkipListMap[String, Row] =
    new ConcurrentSkipListMap[String, Row](
      (a: String, b: String) => RowRange.compareKeys(a, b))

  override def mutateRows(table: String, mutations: Seq[(String, Seq[BtCell])]): Unit = {
    val t = tables.computeIfAbsent(table, _ => newTable())
    val ledger = ledgers.computeIfAbsent(table, _ => new Ledger())
    mutations.foreach { case (key, cells) =>
      // putIfAbsent, not computeIfAbsent-with-flag: ConcurrentSkipListMap
      // does NOT guarantee the mapping function runs atomically/once, so
      // two writers racing on a new key could both observe created=true
      // and permanently over-count the ledger that feeds estimateSize /
      // sampleRowKeys / the AUTO vectorized-path decision (ADVICE r13).
      // putIfAbsent returning null is the single authoritative "I made
      // this row" signal.
      var row = t.get(key)
      if (row == null) {
        val fresh = new Row()
        val prev = t.putIfAbsent(key, fresh)
        if (prev == null) {
          row = fresh
          ledger.rows.incrementAndGet()
          ledger.bytes.addAndGet(key.length.toLong)
        } else row = prev
      }
      cells.foreach { c =>
        val prev = row.put((c.family, c.qualifier, c.timestampMicros), c.value)
        val delta =
          if (prev == null) 16L + c.qualifier.length + c.value.length
          else c.value.length.toLong - prev.length
        ledger.bytes.addAndGet(delta)
      }
    }
  }

  override def truncateTable(table: String): Unit = {
    tables.remove(table)
    ledgers.remove(table): Unit
  }

  private def cellsOf(row: Row): Vector[BtCell] =
    row.entrySet().iterator().asScala.map { e =>
      val (fam, qual, ts) = e.getKey
      BtCell(fam, qual, ts, e.getValue)
    }.toVector.sortBy(c => (c.family, c.qualifier, -c.timestampMicros))

  override def readRows(
      table: String,
      ranges: Seq[RowRange],
      filters: Seq[RowFilter]
  ): Iterator[BtRow] = {
    require(
      ranges.nonEmpty,
      "readRows requires at least one RowRange; use Seq(RowRange.full) for an explicit full scan"
    )
    val data = tables.get(table)
    if (data == null)
      throw new IllegalArgumentException(s"unknown bigtable table: $table")
    RowRange.normalize(ranges).iterator.flatMap { r =>
      data.tailMap(r.startKey, true).entrySet().iterator().asScala
        .takeWhile { e =>
          r.endKey match {
            case None    => true
            case Some(end) =>
              val c = RowRange.compareKeys(e.getKey, end)
              if (r.endInclusive) c <= 0 else c < 0
          }
        }
        .flatMap { e =>
          val kept = CellFilters(cellsOf(e.getValue), filters)
          if (kept.isEmpty) None else Some(BtRow(e.getKey, kept))
        }
    }
  }

  override def sampleRowKeys(table: String): Seq[String] = {
    val data = tables.get(table)
    if (data == null) return Nil
    // ledger row count instead of skip-list size(): size() is O(n) and
    // this runs at planning time on the driver for every scan
    val n = Option(ledgers.get(table)).map(_.rows.get()).getOrElse(0L)
    val targetSamples = 32
    if (n <= 1) Nil
    else {
      val step = math.max(1L, n / targetSamples)
      // one streaming pass collecting ~targetSamples keys (no full
      // key-set materialization)
      val out = Vector.newBuilder[String]
      var i = 0L
      val it = data.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (i > 0 && i % step == 0) out += k
        i += 1
      }
      out.result()
    }
  }

  override def estimateSize(table: String, ranges: Seq[RowRange]): Option[(Long, Long)] = {
    val data = tables.get(table)
    if (data == null) return Some((0L, 0L))
    val normalized = RowRange.normalize(ranges)
    // full scan: answer from the O(1) ledger instead of walking the
    // table (planning-time driver cost must not grow with table size)
    if (normalized == Vector(RowRange.full)) {
      val ledger = ledgers.get(table)
      if (ledger != null) return Some((ledger.rows.get(), ledger.bytes.get()))
    }
    var rows = 0L
    var bytes = 0L
    normalized.foreach { r =>
      data.tailMap(r.startKey, true).entrySet().iterator().asScala
        .takeWhile { e =>
          r.endKey match {
            case None    => true
            case Some(end) =>
              val c = RowRange.compareKeys(e.getKey, end)
              if (r.endInclusive) c <= 0 else c < 0
          }
        }
        .foreach { e =>
          rows += 1
          bytes += e.getKey.length +
            e.getValue.entrySet().iterator().asScala
              .map(c => 16L + c.getKey._2.length + c.getValue.length).sum
        }
    }
    Some((rows, bytes))
  }
}
