package graft.connector

import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side exact evaluation of pushed value predicates on the
  * decoded post-pivot row (the exactness layer behind
  * [[RowRangeComposer.exactValueFilters]]). The server-side cell
  * filters prune over-approximately at cell granularity; this re-checks
  * each predicate against the decoded values of one pivot [[BigtablePivot.Group]]
  * before the row leaves the reader — so a scan with these filters
  * pushed emits EXACTLY the predicate's rows and Spark can drop its
  * residual FilterExec (which in turn unlocks aggregate pushdown under
  * value filters).
  *
  * Comparison semantics must be bit-identical to what Spark's own
  * FilterExec would have computed on the same decoded row:
  * UTF8String binary order for strings, primitive order for longs, and
  * [[SQLOrderingUtil.compareDoubles]] for doubles (NaN largest and
  * self-equal, -0.0 == 0.0) — the exact comparator Catalyst codegen
  * emits for DoubleType. SQL three-valued logic: any comparison against
  * a NULL decoded value is false (the row is dropped), matching the
  * residual filter's behavior.
  */
private[connector] object ValuePredicate {

  /** Compile the accepted filters into one conjunction over a pivot
    * group. Only shapes accepted by
    * [[RowRangeComposer.exactValueFilters]] may be passed; anything
    * else throws at compile (plan) time, never at execute time.
    */
  def compile(cfg: BigtableConfig, filters: Seq[Filter]): Option[BigtablePivot.Group => Boolean] = {
    if (filters.isEmpty) return None
    val qualType: Map[String, DataType] = cfg.qualifiers.toMap
    def src(col: String): BigtablePivot.FieldSrc = {
      val dt = qualType.getOrElse(col,
        throw new IllegalArgumentException(s"value predicate on undeclared qualifier $col"))
      BigtablePivot.Qual(cfg.familyOf(col), col, dt)
    }

    /** 3-valued comparison: Some(cmp) or None when the decoded value is null. */
    def cmp(col: String, lit: Any): BigtablePivot.Group => Option[Int] = {
      val s = src(col)
      qualType(col) match {
        case StringType =>
          val l = UTF8String.fromString(lit.asInstanceOf[String])
          g => BigtablePivot.extract(s, g) match {
            case null          => None
            case v: UTF8String => Some(v.compareTo(l))
            case other         => throw new IllegalStateException(s"non-string decode for $col: $other")
          }
        case LongType =>
          val l = lit.asInstanceOf[java.lang.Long].longValue()
          g => BigtablePivot.extract(s, g) match {
            case null    => None
            case v: Long => Some(java.lang.Long.compare(v, l))
            case other   => throw new IllegalStateException(s"non-long decode for $col: $other")
          }
        case DoubleType =>
          val l = lit.asInstanceOf[java.lang.Double].doubleValue()
          g => BigtablePivot.extract(s, g) match {
            case null      => None
            case v: Double => Some(SQLOrderingUtil.compareDoubles(v, l))
            case other     => throw new IllegalStateException(s"non-double decode for $col: $other")
          }
        case other => throw new IllegalArgumentException(s"unsupported value-predicate type $other for $col")
      }
    }

    def one(f: Filter): BigtablePivot.Group => Boolean = f match {
      case EqualTo(c, v)            => val k = cmp(c, v); g => k(g).contains(0)
      case GreaterThan(c, v)        => val k = cmp(c, v); g => k(g).exists(_ > 0)
      case GreaterThanOrEqual(c, v) => val k = cmp(c, v); g => k(g).exists(_ >= 0)
      case LessThan(c, v)           => val k = cmp(c, v); g => k(g).exists(_ < 0)
      case LessThanOrEqual(c, v)    => val k = cmp(c, v); g => k(g).exists(_ <= 0)
      case In(c, vs)                =>
        val ks = vs.toSeq.map(v => cmp(c, v))
        g => ks.exists(k => k(g).contains(0))
      case StringStartsWith(c, p)   =>
        val s = src(c)
        val pre = UTF8String.fromString(p)
        g => BigtablePivot.extract(s, g) match {
          case null          => false
          case v: UTF8String => v.startsWith(pre)
          case other         => throw new IllegalStateException(s"non-string decode for $c: $other")
        }
      case IsNull(c)    => val s = src(c); g => BigtablePivot.extract(s, g) == null
      case IsNotNull(c) => val s = src(c); g => BigtablePivot.extract(s, g) != null
      case other =>
        throw new IllegalArgumentException(s"filter shape not exactly evaluable post-pivot: $other")
    }

    val compiled = filters.map(one).toArray
    Some(g => {
      var i = 0
      var ok = true
      while (ok && i < compiled.length) {
        ok = compiled(i)(g)
        i += 1
      }
      ok
    })
  }
}
