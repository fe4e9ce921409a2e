package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash implementation shared by interpreted eval and
  * generated code. Standard Charikar construction: each token's 64-bit
  * hash votes ±1 per bit position; the sign of each tally becomes the
  * output bit. Near-duplicate texts land within a small Hamming
  * distance of each other.
  */
object SimHashImpl {
  private val Seed = 42L

  // One MD5 instance per executor thread (getInstance per row would churn)
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def simhash64(tokens: ArrayData): Long = simhash(tokens, md5 = false)

  /** MD5-derived token hash variant: h(token) = first 8 digest bytes,
    * big-endian — exactly `('0x' || substr(md5(t),1,16))::UBIGINT` in
    * engines with only standard digests, which lets an external SQL
    * oracle replicate the full SimHash bit-for-bit. ~3-4x slower than
    * xxh64 per token; use the default for production-scale runs and this
    * one where cross-engine verifiability matters.
    */
  def simhash64Md5(tokens: ArrayData): Long = simhash(tokens, md5 = true)

  private def simhash(tokens: ArrayData, md5: Boolean): Long = {
    val counts = new Array[Int](64)
    val md = if (md5) md5Local.get() else null
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h =
          if (md5) {
            md.reset()
            val d = md.digest(t.getBytes)
            ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
              ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
              ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          } else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Catalyst expression `simhash64(array<string>) -> long` with codegen
  * (a static call, so it stays inside whole-stage codegen — no UDF
  * serialization, no codegen fallback on the hot path).
  */
case class SimHash64(child: Expression, md5: Boolean = false) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = if (md5) "simhash64_md5" else "simhash64"

  private def implName = if (md5) "simhash64Md5" else "simhash64"

  override def nullSafeEval(input: Any): Any =
    if (md5) SimHashImpl.simhash64Md5(input.asInstanceOf[ArrayData])
    else SimHashImpl.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.$implName($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
