package graft.store

import graft.model._

import java.util.concurrent.ConcurrentHashMap
import scala.collection.immutable.TreeMap
import scala.jdk.CollectionConverters._

/** Storage abstraction standing in for the Bigtable service.
  *
  * Mirrors the single call the reference issues — one `ReadRows` gRPC
  * request carrying row ranges plus a chain of server-side filters
  * (reference: src/execute_plan.rs:169-183). A production deployment
  * would implement this trait with a gRPC client whose channel is
  * opened lazily on the executor (inside `PartitionReader` creation);
  * the in-memory implementation below is the emulator used by tests
  * and the driver harness.
  */
trait BigtableStore extends Serializable {
  /** Read rows whose key falls in any of `ranges` (closed-closed,
    * lexicographic on UTF-8 bytes; empty = full scan is NOT offered —
    * the composer never produces it, composer.rs:72-77), applying
    * `filters` as a chain (logical AND) in order.
    * Rows are returned in key order; cells within a row are ordered by
    * (qualifier, timestamp desc) like Bigtable.
    */
  def readRows(table: String, ranges: Seq[RowRange], filters: Seq[RowFilter]): Iterator[BtRow]
}

/** In-memory, immutable-snapshot Bigtable emulator.
  *
  * Data layout: table -> TreeMap(rowKey -> cells). TreeMap ordering uses
  * UTF-8-byte unsigned order so range reads match Bigtable key order.
  * Instances are serializable, so a snapshot can ship inside a Spark
  * task closure when no shared JVM is available; in local mode readers
  * resolve the store through [[BigtableStores]] by name instead.
  */
final class InMemoryBigtable private (
    private val tables: Map[String, TreeMap[String, Vector[BtCell]]]
) extends BigtableStore {

  override def readRows(
      table: String,
      ranges: Seq[RowRange],
      filters: Seq[RowFilter]
  ): Iterator[BtRow] = {
    val data = tables.getOrElse(
      table,
      throw new IllegalArgumentException(s"unknown bigtable table: $table")
    )
    // Merge ranges into a key-ordered, de-duplicated row iterator.
    val keys: Iterator[String] =
      if (ranges.isEmpty) Iterator.empty
      else {
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        // rangeFrom/rangeTo on the TreeMap is O(log n) per range — point
        // lookups and short scans stay cheap even with many ranges.
        ranges.foreach { r =>
          data
            .rangeFrom(r.startKey)
            .iterator
            .takeWhile { case (k, _) => RowRange.compareKeys(k, r.endKey) <= 0 }
            .foreach { case (k, _) => seen += k }
        }
        seen.iterator.toVector.sorted(InMemoryBigtable.keyOrdering).iterator
      }
    keys.flatMap { k =>
      val cells = applyFilters(data(k), filters)
      if (cells.isEmpty) None else Some(BtRow(k, cells))
    }
  }

  /** Apply the filter chain in order, as Bigtable does
    * (execute_plan.rs:175-180): each filter narrows the surviving cells.
    */
  private def applyFilters(cells: Vector[BtCell], filters: Seq[RowFilter]): Vector[BtCell] =
    filters.foldLeft(cells) { (cs, f) =>
      f match {
        case RowFilter.FamilyNameRegex(re) =>
          val p = re.r.pattern
          cs.filter(c => p.matcher(c.family).matches())
        case RowFilter.ColumnQualifierRegex(re) =>
          val p = re.r.pattern
          cs.filter(c => p.matcher(c.qualifier).matches())
        case RowFilter.CellsPerColumnLimit(n) =>
          // keep newest n versions per (family, qualifier)
          cs.groupBy(c => (c.family, c.qualifier))
            .valuesIterator
            .flatMap(_.sortBy(-_.timestampMicros).take(n))
            .toVector
      }
    }.sortBy(c => (c.qualifier, -c.timestampMicros))
}

object InMemoryBigtable {
  /** Bigtable key order = unsigned byte order of the UTF-8 encoding. */
  val keyOrdering: Ordering[String] = (a: String, b: String) => RowRange.compareKeys(a, b)

  def apply(tables: Map[String, Seq[(String, Seq[BtCell])]]): InMemoryBigtable = {
    val built = tables.map { case (t, rows) =>
      val grouped = rows
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.flatMap(_._2).toVector }
      t -> (TreeMap.empty[String, Vector[BtCell]](keyOrdering) ++ grouped)
    }
    new InMemoryBigtable(built)
  }

  /** Builder-style mutable seeder, then snapshot. */
  final class Builder {
    private val rows =
      scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, Vector[BtCell]]]

    def put(table: String, rowKey: String, cell: BtCell): this.type = {
      val t = rows.getOrElseUpdate(table, scala.collection.mutable.Map.empty)
      t.updateWith(rowKey) {
        case Some(cs) => Some(cs :+ cell)
        case None     => Some(Vector(cell))
      }
      this
    }

    def build(): InMemoryBigtable = {
      val built = rows.toMap.map { case (t, m) =>
        t -> (TreeMap.empty[String, Vector[BtCell]](keyOrdering) ++ m)
      }
      new InMemoryBigtable(built)
    }
  }
}

/** JVM-wide named registry so executor-side readers can resolve the
  * emulator without shipping the snapshot in every task (valid in
  * local[*] where executors share the driver JVM — the deployment mode
  * of this harness). A cluster deployment swaps in a gRPC-backed
  * [[BigtableStore]] resolved from connection options instead.
  */
object BigtableStores {
  private val registry = new ConcurrentHashMap[String, BigtableStore]()

  def register(name: String, store: BigtableStore): Unit = registry.put(name, store)

  def get(name: String): BigtableStore = {
    val s = registry.get(name)
    if (s == null)
      throw new IllegalStateException(
        s"bigtable store '$name' not registered in this JVM; " +
          "register an emulator via BigtableStores.register or configure a gRPC-backed store"
      )
    s
  }

  def names: Set[String] = registry.keySet().asScala.toSet
}
