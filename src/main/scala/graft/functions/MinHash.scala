package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature as a native loop. The naive formulation —
  * `transform(sequence(0, k-1), i -> array_min(transform(hashes, h ->
  * xxhash64(h, i))))` — evaluates k × |shingles| *interpreted* lambda
  * calls per row (Spark's higher-order functions don't participate in
  * codegen), which measured ~240 s for 5000 docs × 128 hashes at
  * sf0.1. This expression runs the same double loop as compiled JVM
  * code (~1 s): h_i(s) = XXH64(shingleHash_s, seed = i).
  */
object MinHashImpl {
  def signature(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        if (!hashes.isNullAt(j)) {
          val h = XXH64.hashLong(hashes.getLong(j), i.toLong)
          if (h < mn) mn = h
        }
        j += 1
      }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_signature(array<long>) -> array<long>` of length `numHashes`,
  * with codegen via a static call (stays inside whole-stage codegen).
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_signature requires array<long>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
