package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
  * algorithm, public): slide a window of `w` consecutive shingle
  * hashes, keep the minimum of each window, emit the distinct selected
  * values. Guarantees any shared substring of length >= w+k-1 yields at
  * least one shared fingerprint — robust partial-overlap detection at a
  * fraction of the full shingle set's size. Native loop for the same
  * reason as [[MinHashSignature]]: interpreted higher-order lambdas are
  * ~3 orders slower on per-row windows.
  */
object WinnowImpl {
  def winnow(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val limit = math.max(n - w + 1, 1)
    var start = 0
    while (start < limit) {
      val end = math.min(start + w, n)
      var mn = Long.MaxValue
      var i = start
      while (i < end) {
        val h = hashes.getLong(i)
        if (h <= mn) mn = h // rightmost minimum, per the winnowing paper
        i += 1
      }
      out.add(mn)
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow(array<long>, w) -> array<long>` of distinct selected
  * fingerprints, in first-selection order; codegen'd via static call.
  */
case class Winnow(child: Expression, window: Int) extends UnaryExpression {
  require(window >= 1, s"winnow window must be >= 1, got $window")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"winnow requires array<long>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.winnow(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.winnow($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
