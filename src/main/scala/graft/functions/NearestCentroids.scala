package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `nearest_centroids(array<double>) -> array<int>`: indices of the `n`
  * centroids nearest to the input vector by cosine, nearest first, ties
  * broken by smaller index — the coarse-quantizer assignment behind the
  * IVF family ([[graft.operators.Similarity]]).
  *
  * The centroid table rides a BROADCAST VARIABLE, not a plan literal
  * (VERDICT r14 #3): with √N auto-sizing the quantizer reaches 4096
  * centroids × dim 512–1024 = 2–4 M doubles, and embedding that as a
  * `typedlit` in every assignment/probe expression cost
  * serialization + codegen per task and grew the driver plan with the
  * corpus. The broadcast ships once per executor; the expression holds
  * only the handle.
  *
  * Arithmetic replicates the previous higher-order-function chain
  * bit-for-bit so every IVF gate's results are unchanged:
  * sim = dot(v, c) / max(norm(v)·norm(c), 1e-12) with strict
  * left-to-right accumulation ([[DotImpl.dot]] — truncating to the
  * shorter length), and the (−sim, idx) ordering uses Spark's SQL double
  * ordering (NaN greatest, −0.0 == 0.0), exactly what
  * `array_sort(struct(-sim, idx))` did. Evaluation is a compiled
  * selection loop instead of transform/zip_with/array_sort interpreted
  * lambdas over all centroids — the higher-order functions were
  * CodegenFallback anyway, so this strictly removes per-element lambda
  * dispatch (and the O(k log k) sort: O(k·n) with n ≤ probe count).
  */
case class NearestCentroids(
    child: Expression,
    centroids: Broadcast[Array[Array[Double]]],
    n: Int
) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"nearest_centroids requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  // resolved lazily ON THE EXECUTOR: tasks deserialize the handle and
  // read the block-manager-local value; norms precomputed once per
  // executor (sqrt of the same dot — bit-identical to per-row recompute)
  @transient private lazy val cents: Array[Array[Double]] = centroids.value
  @transient private lazy val cnorms: Array[Double] =
    cents.map(c => math.sqrt(DotImpl.selfDot(c)))

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val k = cents.length
    val vnorm = math.sqrt(DotImpl.selfDotArrayData(vec))
    val take = math.min(n, k)
    // best-first insertion buffer: (sim, idx) ordered like
    // array_sort(struct(-sim, idx)) ascending
    val bSim = new Array[Double](take)
    val bIdx = new Array[Int](take)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cents(i)
      val denom = vnorm * cnorms(i)
      val sim = DotImpl.dotArrayData(vec, c) / (if (denom < 1e-12) 1e-12 else denom)
      // does (sim, i) beat the buffer's worst?
      if (filled < take || beats(sim, i, bSim(filled - 1), bIdx(filled - 1))) {
        var pos = if (filled < take) filled else take - 1
        while (pos > 0 && beats(sim, i, bSim(pos - 1), bIdx(pos - 1))) {
          bSim(pos) = bSim(pos - 1)
          bIdx(pos) = bIdx(pos - 1)
          pos -= 1
        }
        bSim(pos) = sim
        bIdx(pos) = i
        if (filled < take) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) { out(j) = bIdx(j); j += 1 }
    new GenericArrayData(out)
  }

  /** (simA, idxA) strictly before (simB, idxB) under ascending
    * (−sim, idx) with Spark's SQL double ordering: equal doubles
    * (including −0.0 vs 0.0) compare 0, NaN sorts greatest.
    */
  private def beats(simA: Double, idxA: Int, simB: Double, idxB: Int): Boolean = {
    val c = if (simA == simB) 0 else java.lang.Double.compare(-simA, -simB)
    if (c != 0) c < 0 else idxA < idxB
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression object itself is the codegen reference (it carries
    // the broadcast handle and the selection loop); the generated code
    // stays a single virtual call, so surrounding whole-stage codegen
    // spans are preserved without inlining the centroid table
    val self = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
