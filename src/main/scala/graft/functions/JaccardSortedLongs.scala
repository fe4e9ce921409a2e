package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact Jaccard similarity of two SORTED, DISTINCT long arrays by a
  * single merge walk — the compiled replacement for
  * `array_intersect`/`array_union` over string shingle sets, whose
  * interpreted element-wise evaluation dominated near-dup verification
  * (~40 s for 460k candidate pairs at sf0.1; this runs in well under a
  * second). Callers pre-hash shingles with xxhash64 (64-bit collisions
  * between shingles of one document pair are ~|sh|²/2⁶⁴ ≈ 10⁻¹¹ —
  * negligible next to MinHash's own approximation).
  */
object JaccardImpl {
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    inter.toDouble / math.max(union, 1).toDouble
  }
}

object IntersectImpl {
  /** Intersection size of two sorted distinct long arrays (merge walk). */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** `intersect_count_sorted(array<long>, array<long>) -> int`, codegen'd. */
case class IntersectCountSortedLongs(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"intersect_count_sorted requires two array<long>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectImpl.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectImpl.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectCountSortedLongs =
    copy(left = newLeft, right = newRight)
}

/** `jaccard_sorted(array<long>, array<long>) -> double`, codegen'd. */
case class JaccardSortedLongs(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"jaccard_sorted requires two array<long>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardImpl.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSortedLongs =
    copy(left = newLeft, right = newRight)
}
