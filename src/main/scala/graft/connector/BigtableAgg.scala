package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A pushed partial aggregate the store-side reader can fold: global
  * COUNT(*) / COUNT(col) / MIN(col) / MAX(col). Beyond the reference
  * (whose roadmap stops at filter pushdown, README.md:44-51); the Spark
  * side re-aggregates the one-partial-row-per-partition output, so the
  * fold is the classic map-side combine pushed all the way into the
  * source.
  */
sealed trait BigtableAgg extends Serializable {
  /** Source column the fold reads, if any. */
  def reference: Option[String]
  def outputField: StructField
  def describe: String
}

object BigtableAgg {
  final case class CountStarAgg() extends BigtableAgg {
    def reference: Option[String] = None
    def outputField: StructField = StructField("count_star", LongType, nullable = false)
    def describe: String = "COUNT(*)"
  }
  final case class CountColAgg(col: String) extends BigtableAgg {
    def reference: Option[String] = Some(col)
    def outputField: StructField = StructField(s"count_$col", LongType, nullable = false)
    def describe: String = s"COUNT($col)"
  }
  final case class MinAgg(col: String, dt: DataType) extends BigtableAgg {
    def reference: Option[String] = Some(col)
    def outputField: StructField = StructField(s"min_$col", dt, nullable = true)
    def describe: String = s"MIN($col)"
  }
  final case class MaxAgg(col: String, dt: DataType) extends BigtableAgg {
    def reference: Option[String] = Some(col)
    def outputField: StructField = StructField(s"max_$col", dt, nullable = true)
    def describe: String = s"MAX($col)"
  }

  private def singleRef(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames().length == 1 => Some(r.fieldNames()(0))
      case _                                               => None
    }

  private def foldableType(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | StringType | TimestampType => true
    case _                                                  => false
  }

  /** Translate one Catalyst v2 aggregate function, or None if the store
    * fold can't express it (the whole aggregation then stays in Spark).
    */
  def translate(cfg: BigtableConfig, f: AggregateFunc): Option[BigtableAgg] = {
    def typed(col: String): Option[DataType] =
      cfg.schema.fields.find(_.name == col).map(_.dataType).filter(foldableType)
    f match {
      case _: CountStar            => Some(CountStarAgg())
      case c: Count if !c.isDistinct() =>
        singleRef(c.column).flatMap(n => typed(n).map(_ => CountColAgg(n)))
      case m: Min => singleRef(m.column).flatMap(n => typed(n).map(dt => MinAgg(n, dt)))
      case m: Max => singleRef(m.column).flatMap(n => typed(n).map(dt => MaxAgg(n, dt)))
      case _      => None
    }
  }
}

/** Folds the wrapped reader's rows into ONE partial row per partition
  * in the order of `aggs` — no per-row transfer out of the scan.
  * `srcSchema` is the source projection the inner reader emits; each
  * agg's reference is resolved to an ordinal in it.
  */
final class BigtableAggregateReader(
    inner: PartitionReader[InternalRow],
    srcSchema: StructType,
    aggs: Seq[BigtableAgg]
) extends PartitionReader[InternalRow] {
  import BigtableAgg._

  private var emitted = false
  private var result: InternalRow = _

  private def ordinal(col: String): Int = {
    val i = srcSchema.fieldIndex(col)
    require(i >= 0, s"agg column $col missing from source schema")
    i
  }

  /** (ordinal, datatype) per agg; -1 for COUNT(*). */
  private val plan: Array[(Int, DataType)] = aggs.map {
    case CountStarAgg()  => (-1, LongType)
    case CountColAgg(c)  => (ordinal(c), LongType)
    case MinAgg(c, dt)   => (ordinal(c), dt)
    case MaxAgg(c, dt)   => (ordinal(c), dt)
  }.toArray

  private def lt(dt: DataType, a: Any, b: Any): Boolean = dt match {
    case LongType | TimestampType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case DoubleType               => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case StringType               => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]) < 0
    case other                    => throw new IllegalStateException(s"unfoldable agg type $other")
  }

  override def next(): Boolean = {
    if (emitted) return false
    val acc = new Array[Any](aggs.size)
    val counts = new Array[Long](aggs.size)
    while (inner.next()) {
      val row = inner.get()
      var i = 0
      while (i < plan.length) {
        val (ord, dt) = plan(i)
        aggs(i) match {
          case _: CountStarAgg => counts(i) += 1
          case _: CountColAgg  => if (!row.isNullAt(ord)) counts(i) += 1
          case _: MinAgg =>
            if (!row.isNullAt(ord)) {
              val v = row.get(ord, dt)
              if (acc(i) == null || lt(dt, v, acc(i))) acc(i) = v
            }
          case _: MaxAgg =>
            if (!row.isNullAt(ord)) {
              val v = row.get(ord, dt)
              if (acc(i) == null || lt(dt, acc(i), v)) acc(i) = v
            }
        }
        i += 1
      }
    }
    val out = new Array[Any](aggs.size)
    var i = 0
    while (i < aggs.size) {
      out(i) = aggs(i) match {
        case _: CountStarAgg | _: CountColAgg => counts(i)
        case _                                => acc(i)
      }
      i += 1
    }
    result = new GenericInternalRow(out)
    emitted = true
    true
  }

  override def get(): InternalRow = result
  override def close(): Unit = inner.close()
}
