package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two double arrays as a compiled loop with strict
  * left-to-right accumulation — bit-identical to a SQL engine's
  * sequential list fold (the property the DuckDB knn oracle relies on)
  * but without the interpreted per-element lambda cost of
  * `aggregate(zip_with(...))`: at ANN scale the cosine is evaluated
  * |corpus| × |queries| times and is the single hottest expression in
  * the engine.
  */
object DotImpl {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Same left-to-right fold against a raw double array — the
    * broadcast-centroid variant ([[NearestCentroids]]); identical
    * accumulation order, so results are bit-equal to [[dot]].
    */
  def dotArrayData(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b(i)
      i += 1
    }
    acc
  }

  def selfDot(a: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * a(i); i += 1 }
    acc
  }

  def selfDotArrayData(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    acc
  }
}

/** `dot_product(array<double>, array<double>) -> double`, codegen'd. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"dot_product requires two array<double>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
