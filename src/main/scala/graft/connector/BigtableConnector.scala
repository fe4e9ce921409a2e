package graft.connector

import graft.model._
import graft.store.BigtableStores

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.regex.Pattern
import scala.jdk.CollectionConverters._

/** Spark DataSource V2 connector for the Bigtable-shaped store — the
  * Spark-native re-expression of the reference's TableProvider +
  * BigtableExec (reference: src/datasource.rs:119-166,
  * src/execute_plan.rs:45-313). Registered as format "bigtable".
  *
  * Architecture (SURVEY.md §1.5, §4.2): Catalyst's
  * `V2ScanRelationPushDown` drives column pruning and filter pushdown
  * into [[BigtableScanBuilder]]; the row-range composition is
  * [[RowRangeComposer]]; execution is a standard `BatchScanExec` over
  * one [[BigtableInputPartition]] per *split* key range — true
  * partition-aware parallelism the reference lacks
  * (`UnknownPartitioning(1)`, execute_plan.rs:84-86; unchecked roadmap
  * item README.md:50) — with readers that stream rows incrementally
  * instead of materializing one batch (execute_plan.rs:306-310).
  */
class BigtableTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bigtable"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BigtableConfig.fromOptions(options.asCaseSensitiveMap()).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table =
    new BigtableTable(BigtableConfig.fromOptions(properties))
}

final class BigtableTable(cfg: BigtableConfig)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  /** With `shipStore=true`, capture the registered store handle now —
    * table creation happens on the driver, where the registry is
    * populated — so scans built from this table carry it to executors
    * that never saw `BigtableStores.register` (cluster deployment; the
    * reference instead opens a fresh connection executor-side,
    * datasource.rs:81-88).
    */
  private val shippedStore: Option[graft.store.BigtableStore] =
    if (cfg.shipStore && BigtableStores.contains(cfg.storeName))
      Some(BigtableStores.get(cfg.storeName))
    else None
  override def name(): String = s"bigtable.${cfg.table}"
  override def schema(): StructType = cfg.schema
  override def capabilities(): java.util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: a write needn't carry every declared qualifier
    // (absent column = no cells, reads back NULL) nor `_timestamp`
    // (pinned writeTimestampMicros then applies). Spark's by-name
    // output resolution would demand the full read schema; the
    // BatchWrite validates what IS provided driver-side instead.
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BigtableScanBuilder(cfg, shippedStore)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new BigtableWriteBuilder(cfg, info.schema())
}

/** Pushdown surface: equivalent of `TableProvider::scan` receiving
  * projection + filters (reference datasource.rs:140-159).
  *
  * Filter pushdown is *inexact* (A14, datasource.rs:163-165): we keep a
  * copy of every filter for range composition but return ALL of them as
  * residual, so Spark retains its `FilterExec` above the scan and
  * over-broad lexicographic ranges can never produce wrong answers.
  */
final class BigtableScanBuilder(cfg: BigtableConfig, shippedStore: Option[graft.store.BigtableStore] = None)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var filters: Array[Filter] = Array.empty
  private var requiredSchema: StructType = cfg.schema
  private var limit: Option[Int] = None
  private var topNOrders: Option[Seq[String]] = None
  private var pushedAggs: Option[(Seq[String], Seq[BigtableAgg])] = None

  /** A15 improvement: the reference ignores the limit (datasource.rs:148);
    * we cap each partition reader at `limit` rows. Declared partially
    * pushed so Spark keeps its global limit above the scan.
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = true

  /** Top-k pushdown on the scan's REPORTED per-partition order: each
    * partition streams (key asc, _timestamp asc) — see
    * [[BigtableScan.outputOrdering]] — so `ORDER BY key [, _timestamp]
    * LIMIT k` can stop every partition reader at its first k surviving
    * rows (they ARE that partition's top-k). Declared partially pushed:
    * Spark's global top-k merges the per-partition prefixes, so the
    * full sort of scan output disappears and each reader transfers at
    * most k rows. Accepted only where the report itself is sound
    * (single-component keys) and only for an ASCENDING prefix of the
    * stream order — anything else keeps Spark's Sort.
    */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int
  ): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    if (pushedAggs.nonEmpty || cfg.partitionCols.size != 1 || orders.isEmpty) return false
    val streamOrder = Seq(cfg.partitionCols.head, BigtableConfig.TimestampCol)
    val named = orders.toSeq.map { o =>
      o.expression() match {
        case r: NamedReference
            if r.fieldNames().length == 1 && o.direction() == SortDirection.ASCENDING =>
          Some(r.fieldNames()(0))
        case _ => None
      }
    }
    if (named.exists(_.isEmpty)) return false
    val cols = named.flatten
    if (cols == streamOrder.take(cols.size)) {
      limit = Some(n)
      topNOrders = Some(cols)
      true
    } else false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    this.filters = filters
    if (!cfg.exactFilterPushdown) filters // all residual = inexact pushdown (A14)
    else {
      // opt-in: provably-exact key filters (range set == predicate set)
      // and value predicates re-checked exactly post-pivot in the reader
      // ([[ValuePredicate]]) need no residual FilterExec — and a scan
      // with zero residual filters is what lets Catalyst push aggregates
      // and top-k down to the store
      val exact = (RowRangeComposer.exactlyPushable(cfg, filters.toSeq) ++
        RowRangeComposer.exactValueFilters(cfg, filters.toSeq)).toSet
      filters.filterNot(exact.contains)
    }
  }

  /** Partial aggregate pushdown (beyond the reference, the natural step
    * after its never-implemented roadmap pushdowns): global
    * COUNT/MIN/MAX fold at the store, one partial row per partition,
    * final (tiny) aggregation in Spark — per-partition aggregation at
    * the source instead of shipping every row, the shape that matters
    * at 100 TB scan volume. Catalyst only calls this when no residual
    * filters remain (so it composes with `exactFilterPushdown` for
    * range-restricted aggregates).
    */
  override def supportCompletePushDown(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    false // partial: Spark re-aggregates the per-partition folds

  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    // GROUP BY pushes only on a LEADING PREFIX of the row-key
    // components: those groups are contiguous in the reader's
    // key-ordered stream, so the per-partition fold streams with one
    // live accumulator (O(1) state at any group cardinality — the shape
    // that survives a per-entity rollup over 100 TB). Anything else
    // (qualifiers, _timestamp, gaps in the key) stays in Spark.
    val groupCols: Option[Seq[String]] =
      agg.groupByExpressions().toSeq.foldLeft(Option(Vector.empty[String])) { (acc, e) =>
        acc.flatMap { cols =>
          e match {
            case r: org.apache.spark.sql.connector.expressions.NamedReference
                if r.fieldNames().length == 1 => Some(cols :+ r.fieldNames()(0))
            case _ => None
          }
        }
      }
    groupCols match {
      case None => false
      case Some(gcols) =>
        val leading = cfg.partitionCols.take(gcols.length)
        if (gcols.distinct.size != gcols.size || gcols.sorted != leading.sorted.toVector) false
        else {
          val specs = agg.aggregateExpressions().toSeq.map(BigtableAgg.translate(cfg, _))
          if (specs.exists(_.isEmpty)) false
          else { pushedAggs = Some((gcols, specs.flatten)); true }
        }
    }
  }

  /** What `explain` shows as PushedFilters — only the ones the composer
    * actually uses for pruning (display-only; mirrors the acceptance
    * conditions in [[RowRangeComposer.composeRanges]] so EXPLAIN never
    * overstates pruning: tail bounds count only when both sides are
    * present and the tail isn't equality-constrained; prefixes only when
    * ASCII and non-empty; nothing counts if the composition fell back to
    * a full scan). `_timestamp` bounds consumed by the cell-window
    * pushdown are reported too.
    */
  override def pushedFilters(): Array[Filter] = {
    import org.apache.spark.sql.sources._
    val tsPushed = filters.filter(f => RowRangeComposer.composeTsRange(Seq(f)).isDefined)
    // value predicates push independently of key-range pruning (they
    // narrow cells server-side even on a full scan); under
    // exactFilterPushdown the post-pivot-exact set is reported too
    val valuePushed = (RowRangeComposer.composeValueFilters(cfg, filters.toSeq)._2 ++
      (if (cfg.exactFilterPushdown) RowRangeComposer.exactValueFilters(cfg, filters.toSeq)
       else Nil)).distinct.toArray
    val prunes =
      try RowRangeComposer.composeRanges(cfg, filters.toSeq) != Vector(RowRange.full)
      catch { case _: RowRangeComposer.MissingKeyFilterException => false }
    if (!prunes) return tsPushed ++ valuePushed

    val tailCol = cfg.partitionCols.last
    def eqInCol(f: Filter): Option[String] = f match {
      case EqualTo(c, _: String) if cfg.isPartitionCol(c) => Some(c)
      case In(c, vs) if cfg.isPartitionCol(c) && vs.nonEmpty && vs.forall(_.isInstanceOf[String]) => Some(c)
      case _ => None
    }
    val eqInCols = filters.flatMap(eqInCol).toSet
    val tailEq = eqInCols.contains(tailCol)
    val hasLo = filters.exists { case GreaterThanOrEqual(c, _: String) => c == tailCol; case _ => false }
    val hasHi = filters.exists { case LessThanOrEqual(c, _: String) => c == tailCol; case _ => false }
    val useBounds = !tailEq && hasLo && hasHi
    // prefixes are used only when no two-sided bound took precedence; any
    // valid prefix is then implied by the composed (longest-prefix) range
    val usePrefix = !tailEq && !useBounds
    def validPrefix(f: Filter): Boolean = f match {
      case StringStartsWith(c, p) => c == tailCol && p.nonEmpty && p.forall(_ < 0x80)
      case _                      => false
    }
    val tailByRange = !tailEq && (useBounds || filters.exists(validPrefix))
    val fullyViaConjuncts =
      cfg.partitionCols.forall(eqInCols.contains) ||
        (cfg.partitionCols.init.forall(eqInCols.contains) && tailByRange)
    val keyPushed = filters.filter { f =>
      eqInCol(f).isDefined || (f match {
        case GreaterThanOrEqual(c, _: String) => useBounds && c == tailCol
        case LessThanOrEqual(c, _: String)    => useBounds && c == tailCol
        case s: StringStartsWith              => usePrefix && validPrefix(s)
        // pruning succeeded only through the OR-split channel: the Or
        // conjunct over key columns is what composed the range union
        case o: Or => !fullyViaConjuncts && o.references.forall(cfg.isPartitionCol)
        case _     => false
      })
    }
    keyPushed ++ tsPushed ++ valuePushed
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  override def build(): Scan = {
    // Planning-time composition — the mandatory-filter guard (A8,
    // composer.rs:72-77) fires here, failing the query before execution
    // exactly like the reference's TableProvider::scan.
    // With an aggregate pushed, the source columns are the aggregates'
    // references (requiredSchema still reflects the pre-agg projection).
    val sourceSchema = pushedAggs match {
      case None                => requiredSchema
      case Some((gcols, aggs)) =>
        val refs = (gcols ++ aggs.flatMap(_.reference)).toSet
        StructType(cfg.schema.fields.filter(f => refs.contains(f.name)))
    }
    // exactly-pushed value predicates: re-checked post-pivot in every
    // reader (the exactness layer); their qualifiers must survive the
    // server-side projection regex even when the SELECT list (or the
    // pushed aggregates) never touches them
    val postFilters: Seq[Filter] =
      if (cfg.exactFilterPushdown) RowRangeComposer.exactValueFilters(cfg, filters.toSeq) else Nil
    val requiredQualifiers =
      (sourceSchema.fieldNames.toSeq.filter(cfg.isQualifier) ++
        postFilters.flatMap(_.references).filter(cfg.isQualifier)).distinct
    val comp = RowRangeComposer.compose(cfg, filters.toSeq, requiredQualifiers)
    val tsRange = RowRangeComposer.composeTsRange(filters.toSeq)
    new BigtableScan(cfg, sourceSchema, comp, tsRange, limit, pushedFilters(), shippedStore,
      pushedAggs, postFilters, topNOrders)
  }
}

final class BigtableScan(
    cfg: BigtableConfig,
    requiredSchema: StructType,
    comp: RowRangeComposer.Composition,
    tsRange: Option[(Long, Long)] = None,
    limit: Option[Int] = None,
    pushed: Array[Filter] = Array.empty,
    shippedStore: Option[graft.store.BigtableStore] = None,
    /** Pushed partial aggregates (groupCols, aggs); when set,
      * `requiredSchema` is the SOURCE schema the fold reads and
      * [[readSchema]] is group columns ++ aggregate outputs (one
      * partial row per partition, or per contiguous group per
      * partition when grouped).
      */
    aggs: Option[(Seq[String], Seq[BigtableAgg])] = None,
    /** Exactly-pushed value predicates, re-evaluated on the decoded
      * post-pivot row by every reader (see [[ValuePredicate]]).
      */
    postFilters: Seq[Filter] = Nil,
    /** Pushed top-k sort columns (with `limit` as k) — display only;
      * the cap itself rides the `limit` channel.
      */
    topNOrders: Option[Seq[String]] = None
) extends Scan
    with Batch
    with SupportsReportStatistics
    with SupportsReportOrdering
    with SupportsRuntimeV2Filtering {

  /** Ranges after runtime (DPP-style) narrowing; starts at the
    * planning-time composition.
    */
  @volatile private var effectiveRanges: Vector[RowRange] = comp.ranges

  /** Runtime-prunable attributes: the row-key columns — restricted to
    * those the scan actually outputs (Spark resolves these against the
    * scan's output attributes, so a pruned-away component would fail
    * analysis; a join key is always in the output anyway).
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    cfg.partitionCols
      .filter(requiredSchema.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  /** Runtime filtering (SPARK-37206 DSv2 API): when this scan sits on
    * the probe side of a join keyed on the row key, Spark hands us the
    * build side's key values after it materializes — the dynamic
    * equivalent of partition pruning. We intersect the planned ranges
    * with the delivered IN-set. Over-inclusion is safe (the join still
    * filters), so anything untranslatable is ignored.
    *
    * Composite keys narrow from the LONGEST LEADING component prefix
    * that arrives with IN/=-sets — the same longest-prefix logic as the
    * static composer:
    *   - every component pinned → cartesian product of point keys;
    *   - a leading subset pinned (a join on the first k of n
    *     components) → one prefix range `[p#, successor(p#))` per
    *     prefix combination. A non-leading pinned component can't
    *     factor into lexicographic ranges and is ignored.
    * Candidate ranges are clipped to the planned composition
    * ([[RowRange.intersect]]) so narrowing never reads beyond it, and
    * the combination count is budgeted by `maxComposedRanges`.
    */
  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    // no key columns → nothing to narrow on; without this guard the fold
    // below would vacuously pin the scan to the point key ""
    if (cfg.partitionCols.isEmpty) return
    // longest leading run of components with per-component IN-sets
    // (intersected when a component appears in several predicates)
    val leading: Vector[Set[String]] = cfg.partitionCols.iterator
      .map { c =>
        val sets = predicates.flatMap(BigtableScan.inSetValues(_, c))
        if (sets.isEmpty) None else Some(sets.map(_.toSet).reduce(_ intersect _))
      }
      .takeWhile(_.isDefined)
      .flatten
      .toVector
    if (leading.isEmpty) return
    val product = leading.map(_.size.toLong).product
    if (product > cfg.maxComposedRanges) return
    val prefixes = leading
      .map(_.toVector.sorted)
      .foldLeft(Vector("")) { (acc, vs) =>
        for (p <- acc; v <- vs) yield if (p.isEmpty) v else p + cfg.separator + v
      }
    val fullPin = leading.size == cfg.partitionCols.size
    val candidates: Vector[RowRange] =
      if (fullPin) prefixes.map(RowRange.point)
      else {
        // prefix ranges are exact only for ASCII prefixes (successor =
        // last byte + 1); if ANY prefix can't be bounded exactly we must
        // not narrow at all — dropping that prefix would lose its rows
        val bounded = prefixes.map { p =>
          val pre = p + cfg.separator
          if (pre.forall(_ < 0x80)) Some(RowRangeComposer.prefixRange(pre)) else None
        }
        if (bounded.exists(_.isEmpty)) return
        bounded.flatten
      }
    // an empty intersection legitimately yields zero partitions
    effectiveRanges = RowRange.normalize(
      candidates.flatMap(c => comp.ranges.flatMap(r => RowRange.intersect(c, r))))
  }

  /** Visible for tests/metrics: the ranges the scan will actually read. */
  private[connector] def currentRanges: Vector[RowRange] = effectiveRanges

  /** A16 improvement over the reference's `todo!()` statistics
    * (execute_plan.rs:152-157): range-scoped estimates from the store,
    * letting Catalyst auto-broadcast small connector tables in joins.
    */
  override def estimateStatistics(): Statistics = {
    val est =
      try BigtableStores.resolve(cfg.storeName, shippedStore).estimateSize(cfg.table, comp.ranges)
      catch { case _: IllegalStateException => None }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        est.map(e => java.util.OptionalLong.of(e._2)).getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        est.map(e => java.util.OptionalLong.of(e._1)).getOrElse(java.util.OptionalLong.empty())
    }
  }

  override def readSchema(): StructType = aggs match {
    case None               => requiredSchema
    case Some((gcols, as))  =>
      // group columns first (pushed order), then aggregates — the
      // output contract of V2ScanRelationPushDown's partial pushdown
      val groupFields = gcols.map(c => cfg.schema.fields(cfg.schema.fieldIndex(c)))
      StructType(groupFields ++ as.map(_.outputField))
  }

  /** Each partition emits rows in (rowKey asc, cell-timestamp asc)
    * order: ranges are normalized (sorted, disjoint), grouped
    * contiguously, and the store streams each range from a key-ordered
    * seek; the pivot then emits versions ascending (see
    * [[BigtablePartitionReader]]). Report it so Catalyst's
    * RemoveRedundantSorts drops `ORDER BY key` sorts (single-partition
    * scans) and sort-based downstream operators skip their per-partition
    * sort — a whole sort stage saved at 100 TB scan volume.
    *
    * Only sound for single-component keys: Spark's string comparison is
    * UTF-8-byte order on the COMPONENT, while the store orders the
    * CONCATENATED key — a component containing bytes below the
    * separator would order differently (e.g. keys "a!#b" < "a#z" but
    * components ("a!","b") > ("a","z")), so composite tables report
    * nothing rather than an unsound order.
    */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection}
    if (aggs.nonEmpty) return Array.empty // partial-agg rows carry no key order
    if (cfg.partitionCols.size != 1) return Array.empty
    val keyCol = cfg.partitionCols.head
    val names = requiredSchema.fieldNames
    if (!names.contains(keyCol)) return Array.empty
    val asc = (c: String) =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)
    if (names.contains(BigtableConfig.TimestampCol)) Array(asc(keyCol), asc(BigtableConfig.TimestampCol))
    else Array(asc(keyCol))
  }

  override def toBatch: Batch = this

  override def description(): String = {
    val rangesDesc = comp.ranges
      .take(4)
      .map(r => s"[${r.startKey}, ${r.endKey.getOrElse("∞")}${if (r.endInclusive) "]" else ")"}")
      .mkString(", ")
    val tsDesc = tsRange.map { case (lo, hi) => s" tsWindow=($lo, $hi]µs" }.getOrElse("")
    val limitDesc = topNOrders match {
      case Some(cols) => s" topN=${limit.getOrElse(-1)} order=[${cols.mkString(", ")} ASC]"
      case None       => limit.map(l => s" limit=$l").getOrElse("")
    }
    val aggDesc = aggs.map { case (gcols, as) =>
      val g = if (gcols.isEmpty) "" else s" groupBy=[${gcols.mkString(", ")}]"
      s"$g agg=[${as.map(_.describe).mkString(", ")}]"
    }.getOrElse("")
    // DSv2 explain surfaces only Scan.description(): render the pushed
    // list here (it already mirrors the composer's true acceptance)
    val pushedDesc = s" PushedFilters: [${pushed.mkString(", ")}]"
    s"BigtableScan ${cfg.table} ranges=${comp.ranges.size} ($rangesDesc${if (comp.ranges.size > 4) ", …" else ""}) " +
      s"rowFilters=${comp.rowFilters.size} cols=${requiredSchema.fieldNames.mkString(",")}$tsDesc$limitDesc$aggDesc$pushedDesc"
  }

  /** One InputPartition per split range group. Composed ranges are split
    * at the store's sampled row keys (the emulator analogue of
    * Bigtable's `SampleRowKeys` RPC, used exactly this way by the
    * public HBase/Beam connectors) so a large BETWEEN range fans out
    * across executors instead of reading on one task like the
    * reference's single-partition scan (execute_plan.rs:84-86).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val samples =
      try BigtableStores.resolve(cfg.storeName, shippedStore).sampleRowKeys(cfg.table)
      catch { case _: IllegalStateException => Nil } // planning on a driver without the store
    val split = BigtableScan.splitRanges(effectiveRanges, samples)
    val groups = BigtableScan.chunkContiguous(split, cfg.maxPartitions)
    groups.map(g => BigtableInputPartition(g, tsRange): InputPartition).toArray
  }

  /** Read-path selection: explicit option/conf wins; AUTO picks the
    * columnar reader only when the scan's estimated row volume clears
    * `vectorizedAutoRows` (r13 measurement: columnar decodes ~20%
    * faster past ~100k rows, but its fixed per-partition batch
    * allocation loses ~10% on point lookups — the default should
    * follow the data). Unknown statistics stay on the row path.
    */
  private lazy val useColumnar: Boolean = cfg.vectorized.getOrElse {
    val est =
      try BigtableStores.resolve(cfg.storeName, shippedStore).estimateSize(cfg.table, comp.ranges)
      catch { case _: IllegalStateException => None }
    est.exists(_._1 >= cfg.vectorizedAutoRows)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // agg mode ignores the pushed limit: Spark never pushes a limit
    // below an aggregate, and capping the fold's input would be wrong
    new BigtablePartitionReaderFactory(
      cfg, requiredSchema, comp.rowFilters,
      if (aggs.isDefined) None else limit, shippedStore, aggs, postFilters, useColumnar)

  /** Streaming read: cell versions become a change stream ordered by
    * cell timestamp (micro-batch offsets = timestamp high-watermark).
    * Requires `onlyReadLatest=false` — each cell version is one event.
    */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(
      !cfg.onlyReadLatest,
      "streaming read requires onlyReadLatest=false (each cell version is one change event)"
    )
    new BigtableMicroBatchStream(cfg, requiredSchema, comp, shippedStore, postFilters)
  }
}

object BigtableScan {
  /** Translate a V2 runtime predicate to the string key values it pins
    * `keyCol` to: `IN(col, lits...)` or `=(col, lit)` with UTF-8 string
    * literals. None for anything else (ignored — over-inclusion safe).
    */
  private[connector] def inSetValues(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate,
      keyCol: String
  ): Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    def colMatches(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
      case r: NamedReference => r.fieldNames().sameElements(Array(keyCol))
      case _                 => false
    }
    def litString(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
      case l: Literal[_] if l.dataType == StringType && l.value != null => Some(l.value.toString)
      case _                                                           => None
    }
    p.name() match {
      case "IN" if p.children().nonEmpty && colMatches(p.children().head) =>
        val lits = p.children().tail.map(litString)
        if (lits.nonEmpty && lits.forall(_.isDefined)) Some(lits.map(_.get).toSeq) else None
      case "=" if p.children().length == 2 && colMatches(p.children().head) =>
        litString(p.children()(1)).map(Seq(_))
      case _ => None
    }
  }

  /** Split each range at the sample keys strictly inside it:
    * `[a, b]` with samples s1 < s2 inside → `[a,s1) [s1,s2) [s2,b]`.
    */
  def splitRanges(ranges: Vector[RowRange], samples: Seq[String]): Vector[RowRange] =
    if (samples.isEmpty) ranges
    else
      ranges.flatMap { r =>
        val inside = samples.filter { s =>
          RowRange.compareKeys(s, r.startKey) > 0 && (r.endKey match {
            case None    => true
            case Some(e) => RowRange.compareKeys(s, e) < 0
          })
        }
        if (inside.isEmpty) Vector(r)
        else {
          val bounds = r.startKey +: inside.toVector
          bounds.zip(inside).map { case (lo, hi) => RowRange.closedOpen(lo, hi) } :+
            RowRange(inside.last, r.endKey, r.endInclusive)
        }
      }

  /** Balanced contiguous grouping of ranges into at most `maxGroups`
    * partitions (contiguity preserves per-partition key ordering).
    */
  def chunkContiguous(ranges: Vector[RowRange], maxGroups: Int): Vector[Vector[RowRange]] = {
    if (ranges.isEmpty) return Vector.empty
    val n = ranges.size
    val groups = math.max(1, math.min(maxGroups, n))
    val base = n / groups
    val extra = n % groups
    val out = Vector.newBuilder[Vector[RowRange]]
    var idx = 0
    var g = 0
    while (g < groups) {
      val size = base + (if (g < extra) 1 else 0)
      out += ranges.slice(idx, idx + size)
      idx += size
      g += 1
    }
    out.result()
  }
}

/** One scan task: a group of disjoint key ranges, plus (streaming only)
  * the micro-batch cell-timestamp window `tsLo < ts <= tsHi`.
  */
final case class BigtableInputPartition(
    ranges: Seq[RowRange],
    tsRange: Option[(Long, Long)] = None
) extends InputPartition

final class BigtablePartitionReaderFactory(
    cfg: BigtableConfig,
    readSchema: StructType,
    rowFilters: Seq[RowFilter],
    limit: Option[Int] = None,
    /** Store handle serialized with this factory when `shipStore=true`:
      * the executor-side fallback when the JVM registry misses (cluster
      * deployment without a shared driver JVM). One copy per scan — the
      * factory is serialized once into the task binary, not once per
      * InputPartition.
      */
    shippedStore: Option[graft.store.BigtableStore] = None,
    aggs: Option[(Seq[String], Seq[BigtableAgg])] = None,
    /** Exactly-pushed value predicates; serialized as plain source
      * Filters and compiled executor-side per reader (the compiled
      * closure holds UTF8String literals — cheap to rebuild, awkward to
      * ship).
      */
    postFilters: Seq[Filter] = Nil,
    /** Resolved read path (explicit pin or AUTO-by-volume — see
      * [[BigtableScan.useColumnar]]); agg mode always reads rows (one
      * partial per partition — nothing to vectorize).
      */
    useColumnar: Boolean = false
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BigtableInputPartition]
    val base = new BigtablePartitionReader(cfg, readSchema, rowFilters, p.ranges, p.tsRange, limit,
      shippedStore, ValuePredicate.compile(cfg, postFilters))
    aggs match {
      case None                           => base
      case Some((gcols, as)) if gcols.isEmpty =>
        new BigtableAggregateReader(base, readSchema, as)
      case Some((gcols, as)) =>
        new BigtableGroupedAggregateReader(base, readSchema, gcols, as)
    }
  }

  /** Vectorized path: batches of decoded columns, except in agg mode
    * (one partial row per partition — nothing to vectorize).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    useColumnar && aggs.isEmpty

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[BigtableInputPartition]
    new BigtableColumnarPartitionReader(
      cfg, readSchema, rowFilters, p.ranges, p.tsRange, limit, shippedStore,
      cfg.vectorizedBatchSize, ValuePredicate.compile(cfg, postFilters))
  }
}

/** Executor-side reader: issues the store read (the reference's one gRPC
  * `ReadRows`, execute_plan.rs:169-183) for this partition's ranges and
  * performs the cell→row pivot (A13, execute_plan.rs:186-304)
  * *incrementally*: one `(row_key, timestamp)` group at a time, in
  * deterministic (rowKey, timestamp) order — never materializing the
  * result set like the reference's nested-HashMap pivot.
  *
  * Semantics mirrored exactly: composite keys split on the separator
  * into the partition columns (execute_plan.rs:236-251); with
  * `onlyReadLatest=false` every cell version becomes its own output row
  * keyed by `(row_key, timestamp)` (execute_plan.rs:223-271).
  * Deliberate fix: a projected qualifier with no cell in the group
  * yields SQL NULL (the reference pushes empty bytes and would panic
  * decoding Int64, execute_plan.rs:264-267).
  */
final class BigtablePartitionReader(
    cfg: BigtableConfig,
    readSchema: StructType,
    rowFilters: Seq[RowFilter],
    ranges: Seq[RowRange],
    tsRange: Option[(Long, Long)],
    limit: Option[Int] = None,
    shippedStore: Option[graft.store.BigtableStore] = None,
    postFilter: Option[BigtablePivot.Group => Boolean] = None
) extends PartitionReader[InternalRow] {

  // key-split / ts-window / version-explosion / decode all live in
  // BigtablePivot, shared verbatim with the columnar reader
  private val fields = readSchema.fields
  private val plan = BigtablePivot.fieldPlan(cfg, readSchema)

  private val groupIter: BigtablePivot.GroupIterator =
    BigtablePivot.groups(cfg, rowFilters, ranges, tsRange, limit, shippedStore, postFilter)
  private val rowIter: Iterator[InternalRow] =
    groupIter.map { g =>
      val values = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        values(i) = BigtablePivot.extract(plan(i), g)
        i += 1
      }
      new GenericInternalRow(values)
    }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (rowIter.hasNext) { current = rowIter.next(); true }
    else false

  override def get(): InternalRow = current

  // release the underlying store scan even when partially consumed — a
  // pushed limit/topN stops mid-stream, and a socket-backed scan must
  // not leak its connection (ADVICE r13)
  override def close(): Unit = groupIter.close()
}
