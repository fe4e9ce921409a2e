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

object MinHashBytesImpl {
  /** Low byte of every signature component, packed into a binary — the
    * compact pair-similarity sketch. 1 byte/component instead of the
    * 8-byte long (and ~16 bytes/element once inside UnsafeArrayData), so
    * carrying it through a bucket self-join costs ~1/16th of carrying
    * the signature itself.
    */
  def packLowBytes(sig: ArrayData): Array[Byte] = {
    val n = sig.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = (sig.getLong(i) & 0xffL).toByte
      i += 1
    }
    out
  }

  /** Fraction of equal positions between two equal-length byte sketches
    * (0.0 on length mismatch — defensive, never happens for signatures
    * built with one numHashes). Estimates pair Jaccard: each MinHash
    * component matches with probability j, and the byte truncation can
    * only ADD spurious matches (p = j + (1-j)/256), so thresholding the
    * fraction from below admits extras but biases against drops.
    */
  def fractionEqual(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length != b.length || a.length == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < a.length) {
      if (a(i) == b(i)) eq += 1
      i += 1
    }
    eq.toDouble / a.length
  }
}

/** `pack_low_bytes(array<long>) -> binary`: 1-byte-per-component MinHash
  * sketch (see [[MinHashBytesImpl.packLowBytes]]). Codegen'd static call.
  */
case class PackLowBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pack_low_bytes requires array<long>, got ${other.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_low_bytes"

  override def nullSafeEval(input: Any): Any =
    MinHashBytesImpl.packLowBytes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashBytesImpl.packLowBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): PackLowBytes =
    copy(child = newChild)
}

/** `bytes_fraction_equal(binary, binary) -> double`: fraction of equal
  * positions — the MinHash-sketch similarity estimator evaluated inline
  * in LSH bucket joins (codegen'd, so the join filter stays inside
  * whole-stage codegen over hundreds of millions of bucket-pair rows).
  */
case class BytesFractionEqual(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"bytes_fraction_equal requires (binary, binary), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bytes_fraction_equal"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashBytesImpl.fractionEqual(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHashBytesImpl.fractionEqual($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BytesFractionEqual =
    copy(left = newLeft, right = newRight)
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
