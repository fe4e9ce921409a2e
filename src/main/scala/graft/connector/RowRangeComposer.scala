package graft.connector

import graft.model._
import org.apache.spark.sql.sources._

import java.util.regex.Pattern

/** Filter → row-range composer: the Spark-native port of the
  * reference's core IP (reference: src/datasource/composer.rs:13-300).
  *
  * Translates the `org.apache.spark.sql.sources.Filter`s Catalyst
  * pushes into the smallest set of lexicographic row-key ranges:
  *
  *   - `EqualTo(col, utf8)` on a partition col → value list (A4,
  *     composer.rs:163-192)
  *   - `In(col, utf8*)`, non-negated → value list (A5, composer.rs:194-222)
  *   - closed range on the LAST partition col only — Catalyst decomposes
  *     `BETWEEN lo AND hi` into `GreaterThanOrEqual` + `LessThanOrEqual`
  *     before pushdown, so we re-fuse that pair (A6, composer.rs:224-248)
  *   - cartesian product of per-column value lists joined by the
  *     separator → point ranges `[key,key]`; with a tail range →
  *     `[prefix#lo, prefix#hi]` closed-closed (A7, composer.rs:101-162,
  *     287-300)
  *
  * Anything else (other operators, non-string literals, OR trees,
  * non-key columns) is ignored here and handled by Spark's residual
  * `FilterExec` — pushdown is declared inexact (A14, datasource.rs:163-165),
  * so over-broad ranges are always safe.
  *
  * Guard (A8, composer.rs:72-77): if the filters do not constrain every
  * partition column (values for all, or values for a prefix plus a
  * closed range on the tail), the scan fails at planning time — unless
  * the table was registered with `allowFullScan=true`, in which case a
  * whole-keyspace range is returned. Unlike the reference, a *gap* in
  * the constrained columns (e.g. region and event_minute given but not
  * balloon_id, composer.rs:109-137 hazard) is rejected with a clear
  * error instead of silently composing wrong keys.
  */
object RowRangeComposer {

  final case class Composition(ranges: Vector[RowRange], rowFilters: Vector[RowFilter])

  /** Planning-time failure, reference composer.rs:72-77 / 127-133. */
  final class MissingKeyFilterException(msg: String) extends IllegalArgumentException(msg)

  def compose(cfg: BigtableConfig, filters: Seq[Filter], requiredQualifiers: Seq[String]): Composition =
    Composition(
      composeRanges(cfg, filters),
      // value filters AFTER the base chain: CellsPerColumnLimit must pick
      // the latest version BEFORE value filtering, or an older passing
      // version would surface as "latest" (see QualifierValueRange docs)
      composeRowFilters(cfg, requiredQualifiers) ++ composeValueFilters(cfg, filters)._1)

  // ---------------------------------------------------------------------
  // Partition pruning: filters → ranges
  // ---------------------------------------------------------------------

  /** Disjunction handling (beyond the reference, which ignores OR
    * entirely): if the conjuncts alone can't compose, try splitting ONE
    * Or conjunct — `A AND (B OR C)` composes as
    * `compose(A, B) ∪ compose(A, C)`. Recursive, so nested
    * disjunctions of key predicates (e.g. `key='a' OR key BETWEEN ...`)
    * become range unions. Residual filtering keeps exactness (A14).
    */
  def composeRanges(cfg: BigtableConfig, filters: Seq[Filter]): Vector[RowRange] = {
    val conjuncts = filters.flatMap(flattenAnd)
    val ranges =
      try composeConjuncts(cfg, conjuncts)
      catch {
        case e: MissingKeyFilterException =>
          val orIdx = conjuncts.indexWhere(_.isInstanceOf[Or])
          if (orIdx < 0) throw e
          else {
            val Or(lhs, rhs) = conjuncts(orIdx): @unchecked
            val rest = conjuncts.patch(orIdx, Nil, 1)
            RowRange.normalize(
              composeRanges(cfg, rest :+ lhs) ++ composeRanges(cfg, rest :+ rhs))
          }
      }
    // plan-size budget: wide IN×IN cartesians / deep OR trees collapse to
    // one covering range — over-broad is safe (residual filters), while
    // an unbounded range list is a planning-time/request-count hazard
    if (ranges.size > cfg.maxComposedRanges) Vector(RowRange.cover(ranges))
    else ranges
  }

  private def composeConjuncts(cfg: BigtableConfig, conjuncts: Seq[Filter]): Vector[RowRange] = {

    // per-column exact values from = / IN (composer.rs:163-222)
    val values = scala.collection.mutable.Map.empty[String, Vector[String]]
    // tail-column bounds from >= / <= (re-fused BETWEEN, composer.rs:224-248)
    var tailLo: Option[String] = None
    var tailHi: Option[String] = None
    // tail-column prefix from LIKE 'p%' — the canonical Bigtable prefix
    // scan (not in the reference; ASCII prefixes only so the successor
    // bound stays exact in UTF-8 byte order)
    var tailPrefix: Option[String] = None
    val tailCol = cfg.partitionCols.last

    conjuncts.foreach {
      case EqualTo(col, v: String) if cfg.isPartitionCol(col) =>
        values.updateWith(col) { cur => Some(cur.getOrElse(Vector.empty) :+ v) }
      case In(col, vs) if cfg.isPartitionCol(col) && vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        values.updateWith(col) { cur => Some(cur.getOrElse(Vector.empty) ++ vs.map(_.asInstanceOf[String])) }
      case GreaterThanOrEqual(col, v: String) if col == tailCol =>
        tailLo = Some(tailLo.fold(v)(cur => if (RowRange.compareKeys(v, cur) > 0) v else cur))
      case LessThanOrEqual(col, v: String) if col == tailCol =>
        tailHi = Some(tailHi.fold(v)(cur => if (RowRange.compareKeys(v, cur) < 0) v else cur))
      case StringStartsWith(col, p) if col == tailCol && p.nonEmpty && p.forall(_ < 0x80) =>
        // keep the longest prefix if several are pushed
        tailPrefix = Some(tailPrefix.fold(p)(cur => if (p.length > cur.length) p else cur))
      case _ => () // residual-only filter; Spark re-applies it above the scan
    }

    // = and IN on the same column append (union), like the reference
    // (composer.rs:186-189, 214-217) — this can over-fetch, which the
    // residual FilterExec corrects (inexact pushdown, A14)
    val perCol: Map[String, Vector[String]] = values.toMap.map { case (c, vs) => c -> vs.distinct }

    val tailRange: Option[(String, String)] = (tailLo, tailHi) match {
      case (Some(lo), Some(hi)) => Some((lo, hi))
      case _                    => None // one-sided bound: not composable, residual handles it
    }

    val constrained = cfg.partitionCols.map(c => perCol.contains(c))
    val tailByRange = (tailRange.isDefined || tailPrefix.isDefined) && !perCol.contains(tailCol)

    val fullyConstrained =
      constrained.forall(identity) || (constrained.init.forall(identity) && tailByRange)

    if (!fullyConstrained) {
      if (cfg.allowFullScan) return Vector(RowRange.full)
      // distinguish the reference's two error shapes: nothing usable at all
      // (composer.rs:72-77) vs a gap in the composite key (composer.rs:127-133)
      val missing = cfg.partitionCols.filterNot(perCol.contains)
        .filterNot(c => c == tailCol && tailByRange)
      throw new MissingKeyFilterException(
        s"bigtable scan on '${cfg.table}' requires an equality/IN filter on every row-key " +
          s"component (or a BETWEEN on the last one); missing: ${missing.mkString(", ")}. " +
          "Register the table with allowFullScan=true to permit full scans."
      )
    }

    // cartesian product over partition-col value lists, in declaration
    // order (composer.rs:101-162, partial_cartesian 287-300)
    val prefixCols = if (tailByRange) cfg.partitionCols.init else cfg.partitionCols
    val prefixes: Vector[Vector[String]] =
      prefixCols.foldLeft(Vector(Vector.empty[String])) { (acc, col) =>
        val vs = perCol(col)
        acc.flatMap(p => vs.map(v => p :+ v))
      }

    val ranges =
      if (tailByRange) {
        prefixes.map { p =>
          val keyPrefix = if (p.isEmpty) "" else p.mkString("", cfg.separator, cfg.separator)
          (tailRange, tailPrefix) match {
            case (Some((lo, hi)), _) => RowRange.closed(keyPrefix + lo, keyPrefix + hi)
            case (None, Some(pre)) =>
              // prefix scan: [prefix, successor(prefix)) — exact for
              // ASCII prefixes in UTF-8 byte order
              prefixSuccessor(keyPrefix + pre) match {
                case Some(succ) => RowRange.closedOpen(keyPrefix + pre, succ)
                case None       => RowRange(keyPrefix + pre, None, endInclusive = false)
              }
            case _ => throw new IllegalStateException("tailByRange without bounds")
          }
        }
      } else {
        prefixes.map(p => RowRange.point(p.mkString(cfg.separator)))
      }

    RowRange.normalize(ranges)
  }

  /** The subset of pushed filters whose composed range set EQUALS their
    * predicate set — rows emitted by the composed scan are exactly the
    * rows satisfying them, so Spark may drop its residual FilterExec for
    * them (opt-in via `exactFilterPushdown`).
    *
    * Deliberately conservative: single-component keys here, composite
    * keys in [[compositeExactlyPushable]] (all-components-pinned point
    * cartesians only — concatenated-key RANGE shapes over-approximate
    * per-component predicates). Single-key compositions qualify only
    * where the composer's semantics are intersection-faithful:
    *
    *   - exactly ONE `=`/`IN` arm (several arms UNION in the composer,
    *     composer.rs:186-189 parity, but conjunction means intersect);
    *   - or bounds-only with at least one `>=` AND one `<=` (the
    *     composer tightens repeated bounds — true intersection);
    *   - or exactly ONE ASCII `LIKE 'p%'` prefix arm (several keep only
    *     the longest — union-ish, not conjunction).
    *
    * Any other conjunct referencing the key column (OR trees, `<`, `>`,
    * `!=`, non-string literals) disqualifies the whole set, as does an
    * `IN` list wide enough to trip the `maxComposedRanges` collapse.
    * Value/timestamp filters are never exact: their cell-level semantics
    * over-approximate by design (see composeValueFilters).
    */
  def exactlyPushable(cfg: BigtableConfig, filters: Seq[Filter]): Seq[Filter] = {
    if (cfg.partitionCols.size != 1) return compositeExactlyPushable(cfg, filters)
    val k = cfg.partitionCols.head
    val conjuncts = filters.flatMap(flattenAnd)
    val keyRefs = conjuncts.filter(_.references.contains(k))
    val eqIn = keyRefs.collect {
      case f @ EqualTo(`k`, _: String) => f
      case f @ In(`k`, vs) if vs.nonEmpty && vs.length <= cfg.maxComposedRanges &&
          vs.forall(_.isInstanceOf[String]) => f
    }
    val lo = keyRefs.collect { case f @ GreaterThanOrEqual(`k`, _: String) => f }
    val hi = keyRefs.collect { case f @ LessThanOrEqual(`k`, _: String) => f }
    val pre = keyRefs.collect {
      case f @ StringStartsWith(`k`, p) if p.nonEmpty && p.forall(_ < 0x80) => f
    }
    // IsNotNull(key) is vacuously exact: the key is declared non-null
    // and every emitted row has one
    val notNull = keyRefs.collect { case f @ IsNotNull(`k`) => f }
    val classified: Set[Filter] = (eqIn ++ lo ++ hi ++ pre ++ notNull).toSet
    if (keyRefs.exists(f => !classified.contains(f))) return Nil
    val shape =
      if (eqIn.size == 1 && lo.isEmpty && hi.isEmpty && pre.isEmpty) eqIn
      else if (eqIn.isEmpty && lo.nonEmpty && hi.nonEmpty && pre.isEmpty) lo ++ hi
      else if (eqIn.isEmpty && lo.isEmpty && hi.isEmpty && pre.size == 1) pre
      else if (eqIn.isEmpty && lo.isEmpty && hi.isEmpty && pre.isEmpty && cfg.allowFullScan) Nil
      else return Nil
    notNull ++ shape
  }

  /** Composite-key exact shape: EVERY key component pinned by exactly
    * one `=`/`IN` arm composes to a cartesian of POINT ranges `[k, k]`
    * on the concatenated key — each point matches exactly one stored
    * key, so the range set equals the predicate set and the residual
    * FilterExec is droppable (which is what lets Catalyst push
    * aggregates below a composite-key scan, the `bt_composite` shape).
    *
    * Conservative like the single-key path:
    *   - exactly ONE Eq-or-In arm per component (several arms on one
    *     column UNION in the composer — not conjunction-faithful);
    *   - every pinned value a String NOT containing the separator
    *     (a value with the separator makes the concatenation ambiguous:
    *     the composed point could fetch a row whose SPLIT components
    *     differ from the predicate values);
    *   - cartesian size within `maxComposedRanges` (beyond it the
    *     composer collapses to one covering range — over-broad);
    *   - no other key-referencing conjunct (bounds, prefixes, ORs, `!=`
    *     — the tail-BETWEEN shape stays residual: its closed range over
    *     the CONCATENATED key over-approximates the per-component
    *     predicate when the tail values aren't fixed-width).
    */
  private def compositeExactlyPushable(cfg: BigtableConfig, filters: Seq[Filter]): Seq[Filter] = {
    val keyCols = cfg.partitionCols.toSet
    val conjuncts = filters.flatMap(flattenAnd)
    val keyRefs = conjuncts.filter(_.references.exists(keyCols.contains))
    def cleanVal(v: Any): Boolean =
      v.isInstanceOf[String] && !v.asInstanceOf[String].contains(cfg.separator)
    val arms: Seq[(String, Filter, Long)] = keyRefs.collect {
      case f @ EqualTo(c, v) if keyCols.contains(c) && cleanVal(v) => (c, f, 1L)
      case f @ In(c, vs) if keyCols.contains(c) && vs.nonEmpty && vs.forall(cleanVal) =>
        (c, f, vs.length.toLong)
    }
    val notNull = keyRefs.collect { case f @ IsNotNull(c) if keyCols.contains(c) => f }
    val classified: Set[Filter] = (arms.map(_._2) ++ notNull).toSet
    if (keyRefs.exists(f => !classified.contains(f))) return Nil
    val byCol = arms.groupBy(_._1)
    // no key predicate at all on an allowFullScan table: the whole-space
    // scan is trivially exact (mirrors the single-key arm)
    if (arms.isEmpty && cfg.allowFullScan) return notNull
    if (!cfg.partitionCols.forall(c => byCol.get(c).exists(_.size == 1))) return Nil
    val cartesian = arms.map(_._3).product
    if (cartesian > cfg.maxComposedRanges) return Nil
    notNull ++ arms.map(_._2)
  }

  /** Value-predicate filters the executor can evaluate EXACTLY on the
    * decoded post-pivot row (see [[ValuePredicate]]) — the second half
    * of `exactFilterPushdown`. The server-side cell filters from
    * [[composeValueFilters]] stay the pruning layer (over-approximate
    * at cell granularity by design); exactness comes from re-evaluating
    * the predicate on the decoded values inside the reader, which costs
    * one comparison per row and zero extra transfer. Accepting these as
    * fully pushed removes the residual FilterExec, which is what lets
    * Catalyst push aggregates below a value-filtered scan —
    * range-restricted rollups folded at the store.
    *
    * Accepted: =, <, <=, >, >=, IN, LIKE 'p%', IS NULL / IS NOT NULL on
    * a declared qualifier whose literal type matches the declared type
    * (String/Long/Double). `_timestamp` and key columns stay with their
    * own channels; And/Or trees and anything else stay residual.
    */
  def exactValueFilters(cfg: BigtableConfig, filters: Seq[Filter]): Seq[Filter] = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val qualType = cfg.qualifiers.toMap
    def litOk(col: String, v: Any): Boolean = (qualType.get(col), v) match {
      case (Some(StringType), _: String)          => true
      case (Some(LongType), _: java.lang.Long)    => true
      case (Some(DoubleType), _: java.lang.Double) => true
      case _                                       => false
    }
    filters.filter {
      case EqualTo(c, v)             => litOk(c, v)
      case GreaterThan(c, v)         => litOk(c, v)
      case GreaterThanOrEqual(c, v)  => litOk(c, v)
      case LessThan(c, v)            => litOk(c, v)
      case LessThanOrEqual(c, v)     => litOk(c, v)
      case In(c, vs)                 => vs.nonEmpty && vs.forall(litOk(c, _))
      case StringStartsWith(c, p)    => qualType.get(c).contains(StringType) && p != null
      case IsNull(c)                 => qualType.contains(c)
      case IsNotNull(c)              => qualType.contains(c)
      case _                         => false
    }
  }

  /** The range covering exactly the keys starting with `prefix`
    * (exact for ASCII prefixes in UTF-8 byte order).
    */
  private[connector] def prefixRange(prefix: String): RowRange =
    prefixSuccessor(prefix) match {
      case Some(succ) => RowRange.closedOpen(prefix, succ)
      case None       => RowRange(prefix, None, endInclusive = false)
    }

  /** Smallest string greater than every string with the given prefix
    * (Bigtable's prefixSuccessor): increment the last non-max char,
    * truncate the rest; None if the prefix is all max chars.
    */
  private def prefixSuccessor(p: String): Option[String] = {
    val i = p.lastIndexWhere(_ != '￿')
    if (i < 0) None else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  private def flattenAnd(f: Filter): Seq[Filter] = f match {
    case And(l, r) => flattenAnd(l) ++ flattenAnd(r)
    case other     => Seq(other)
  }

  // ---------------------------------------------------------------------
  // Cell-timestamp range pushdown (reference roadmap README.md:48-49,
  // never implemented there): bounds on `_timestamp` narrow the cells a
  // reader decodes. Residual filtering keeps it safe (A14).
  // ---------------------------------------------------------------------

  /** Extract an exclusive-lo / inclusive-hi µs window from `_timestamp`
    * bounds, matching the reader's `(lo, hi]` cell filter. None if the
    * filters don't constrain `_timestamp`.
    */
  def composeTsRange(filters: Seq[Filter]): Option[(Long, Long)] = {
    def micros(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp =>
        Some(math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
      case i: java.time.Instant =>
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case _ => None
    }
    var lo = Long.MinValue // exclusive
    var hi = Long.MaxValue // inclusive
    filters.flatMap(flattenAnd).foreach {
      case GreaterThan(BigtableConfig.TimestampCol, v)        => micros(v).foreach(m => lo = math.max(lo, m))
      case GreaterThanOrEqual(BigtableConfig.TimestampCol, v) => micros(v).foreach(m => lo = math.max(lo, m - 1))
      case LessThan(BigtableConfig.TimestampCol, v)           => micros(v).foreach(m => hi = math.min(hi, m - 1))
      case LessThanOrEqual(BigtableConfig.TimestampCol, v)    => micros(v).foreach(m => hi = math.min(hi, m))
      case EqualTo(BigtableConfig.TimestampCol, v)            => micros(v).foreach(m => { lo = math.max(lo, m - 1); hi = math.min(hi, m) })
      case _                                                  => ()
    }
    if (lo == Long.MinValue && hi == Long.MaxValue) None else Some((lo, hi))
  }

  // ---------------------------------------------------------------------
  // Value-predicate pushdown (reference roadmap README.md:46-47, never
  // implemented there): predicates on declared qualifier columns become
  // per-qualifier server-side value filters. Only encodings whose
  // unsigned BYTE order provably agrees with (or over-approximates) the
  // SQL predicate are pushed — everything else stays residual-only:
  //
  //   - string qualifiers: UTF-8 byte order = string order → =, IN
  //     (regex alternation), two- and one-sided ranges, ASCII prefix.
  //   - long qualifiers (big-endian 8 bytes): equality always; lower
  //     bounds only when >= 0 (negatives sort ABOVE positives in
  //     unsigned byte order, so byte->=enc(lo) merely over-fetches
  //     them — safe); upper bounds only alongside a lower bound >= 0
  //     (a lone byte-<=enc(hi) would wrongly DROP negative values).
  //   - double qualifiers: never pushed — they are stored as decimal
  //     strings whose representation is not canonical ("9.60" vs "9.6"),
  //     so byte comparison could drop cells the predicate accepts.
  //
  // Returns (filters-to-evaluate, source-filters-accepted) so the scan
  // builder can report exactly what was pushed.
  // ---------------------------------------------------------------------

  def composeValueFilters(cfg: BigtableConfig, filters: Seq[Filter]): (Vector[RowFilter], Vector[Filter]) = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val qualType = cfg.qualifiers.toMap
    val out = Vector.newBuilder[RowFilter]
    val accepted = Vector.newBuilder[Filter]

    // per-long-qualifier accumulated numeric bounds (merged at the end)
    val longLo = scala.collection.mutable.Map.empty[String, (Long, Boolean)] // (bound, inclusive)
    val longHi = scala.collection.mutable.Map.empty[String, (Long, Boolean)]
    val longSrc = scala.collection.mutable.Map.empty[String, Vector[Filter]]

    def tightenLo(q: String, v: Long, inc: Boolean, f: Filter): Unit = {
      longLo.updateWith(q) {
        case Some((cur, curInc)) if cur > v || (cur == v && !curInc) => Some((cur, curInc))
        case _                                                      => Some((v, inc))
      }
      longSrc.updateWith(q)(s => Some(s.getOrElse(Vector.empty) :+ f))
    }
    def tightenHi(q: String, v: Long, inc: Boolean, f: Filter): Unit = {
      longHi.updateWith(q) {
        case Some((cur, curInc)) if cur < v || (cur == v && !curInc) => Some((cur, curInc))
        case _                                                      => Some((v, inc))
      }
      longSrc.updateWith(q)(s => Some(s.getOrElse(Vector.empty) :+ f))
    }

    filters.flatMap(flattenAnd).foreach { f =>
      f match {
        case EqualTo(q, v: String) if qualType.get(q).contains(StringType) =>
          val b = CellCodec.encodeString(v)
          out += RowFilter.QualifierValueRange(cfg.familyOf(q), q, Some(b), loInclusive = true, Some(b), hiInclusive = true)
          accepted += f
        case EqualTo(q, v: Long) if qualType.get(q).contains(LongType) =>
          val b = CellCodec.encodeLong(v)
          out += RowFilter.QualifierValueRange(cfg.familyOf(q), q, Some(b), loInclusive = true, Some(b), hiInclusive = true)
          accepted += f
        case In(q, vs) if qualType.get(q).contains(StringType) &&
            vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
          out += RowFilter.QualifierValueRegex(
            cfg.familyOf(q), q, vs.map(v => Pattern.quote(v.asInstanceOf[String])).mkString("|"))
          accepted += f
        case GreaterThan(q, v: String) if qualType.get(q).contains(StringType) =>
          out += RowFilter.QualifierValueRange(cfg.familyOf(q), q, Some(CellCodec.encodeString(v)), loInclusive = false, None, hiInclusive = false)
          accepted += f
        case GreaterThanOrEqual(q, v: String) if qualType.get(q).contains(StringType) =>
          out += RowFilter.QualifierValueRange(cfg.familyOf(q), q, Some(CellCodec.encodeString(v)), loInclusive = true, None, hiInclusive = false)
          accepted += f
        case LessThan(q, v: String) if qualType.get(q).contains(StringType) =>
          out += RowFilter.QualifierValueRange(cfg.familyOf(q), q, None, loInclusive = false, Some(CellCodec.encodeString(v)), hiInclusive = false)
          accepted += f
        case LessThanOrEqual(q, v: String) if qualType.get(q).contains(StringType) =>
          out += RowFilter.QualifierValueRange(cfg.familyOf(q), q, None, loInclusive = false, Some(CellCodec.encodeString(v)), hiInclusive = true)
          accepted += f
        case StringStartsWith(q, p) if qualType.get(q).contains(StringType) &&
            p.nonEmpty && p.forall(_ < 0x80) =>
          val lo = CellCodec.encodeString(p)
          val hi = prefixSuccessor(p).map(CellCodec.encodeString)
          out += RowFilter.QualifierValueRange(cfg.familyOf(q), q, Some(lo), loInclusive = true, hi, hiInclusive = false)
          accepted += f
        case GreaterThan(q, v: Long) if qualType.get(q).contains(LongType) && v >= 0 =>
          tightenLo(q, v, inc = false, f)
        case GreaterThanOrEqual(q, v: Long) if qualType.get(q).contains(LongType) && v >= 0 =>
          tightenLo(q, v, inc = true, f)
        case LessThan(q, v: Long) if qualType.get(q).contains(LongType) =>
          tightenHi(q, v, inc = false, f)
        case LessThanOrEqual(q, v: Long) if qualType.get(q).contains(LongType) =>
          tightenHi(q, v, inc = true, f)
        case _ => () // residual-only (doubles, negatives-lo, unsupported shapes)
      }
    }

    // merge accumulated long bounds: lower bound alone is safe (negatives
    // over-fetched); an upper bound needs a non-negative lower bound
    longSrc.keysIterator.foreach { q =>
      (longLo.get(q), longHi.get(q)) match {
        case (Some((lo, loInc)), hiOpt) =>
          val hiBytes = hiOpt.collect { case (hi, hiInc) if hi >= 0 => (CellCodec.encodeLong(hi), hiInc) }
          out += RowFilter.QualifierValueRange(
            cfg.familyOf(q), q, Some(CellCodec.encodeLong(lo)), loInc,
            hiBytes.map(_._1), hiBytes.exists(_._2))
          // report the hi-side sources only if the hi bound was usable
          accepted ++= longSrc(q).filter {
            case LessThan(_, _) | LessThanOrEqual(_, _) => hiBytes.isDefined
            case _                                      => true
          }
        case _ => () // hi-only: cannot push without a floor at 0
      }
    }

    (out.result(), accepted.result())
  }

  // ---------------------------------------------------------------------
  // Projection pushdown: required qualifiers → server-side filters
  // ---------------------------------------------------------------------

  /** Same chain the reference builds (composer.rs:249-284): family
    * restriction (A10), latest-version limit (A11), then the qualifier
    * regex from the projection (A9) — with literal-quoted names, fixing
    * the reference's unescaped-regex hazard (composer.rs:270-281).
    * An empty qualifier list (key-only projection) pushes no qualifier
    * regex: Bigtable rows exist only through their cells, so at least
    * one cell must survive for the row to be emitted.
    */
  def composeRowFilters(cfg: BigtableConfig, requiredQualifiers: Seq[String]): Vector[RowFilter] = {
    // multi-family extension: restrict to the families the projection
    // touches (all declared families for a key-only projection)
    val declaredQuals = cfg.qualifiers.map(_._1)
    val neededQuals = if (requiredQualifiers.nonEmpty) requiredQualifiers else declaredQuals
    val fams = neededQuals.filter(declaredQuals.contains).map(cfg.familyOf).distinct match {
      case Seq() => cfg.families
      case fs    => fs
    }
    val base = Vector[RowFilter](RowFilter.FamilyNameRegex(fams.map(Pattern.quote).mkString("|")))
    val withLatest =
      if (cfg.onlyReadLatest) base :+ RowFilter.CellsPerColumnLimit(1) else base
    val declared = cfg.qualifiers.map(_._1).toSet
    val quals = requiredQualifiers.filter(declared)
    if (quals.nonEmpty && quals.toSet != declared)
      withLatest :+ RowFilter.ColumnQualifierRegex(quals.map(Pattern.quote).mkString("|"))
    else withLatest
  }
}
