package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization codec (r19 optimization, the
  * [[NearestCentroids]] medicine applied to PQ): the per-row encode was
  * m × an interpreted `slice → transform → zip_with → array_sort → slice`
  * chain over a `typedlit` codebook literal, and decode a
  * `flatten(zip_with(element_at(element_at(...))))` — every element a
  * CodegenFallback lambda dispatch, and every occurrence of the literal
  * re-serialized into the plan (m × k × d/m doubles, repeated per
  * expression: the PQ gates' driver time was dominated by analyzing
  * those trees). Codebooks now ride ONE broadcast handle; evaluation is
  * a compiled argmin/concat loop.
  *
  * Arithmetic replicates the HOF chain bit-for-bit so every PQ gate's
  * results are unchanged:
  *  - subvector j = elements [j·ds, j·ds + ds) of the input, truncated
  *    at the vector's actual length (`slice` semantics on short rows);
  *  - distance = dot(c, c) − 2.0 · dot(sub, c), each dot a strict
  *    left-to-right fold truncating to the shorter operand
  *    ([[DotImpl]]);
  *  - argmin ordering = `array_sort(struct(dist, idx))`: Spark SQL
  *    double ordering (NaN greatest, −0.0 == 0.0), ties to the
  *    smaller index.
  * One deliberate divergence: a NULL input vector yields NULL (the old
  * chain produced an array of m NULL codes — never consumed, since the
  * fixtures and the kmeans path both drop geometry-free rows first).
  */
case class PqEncode(
    child: Expression,
    codebooks: Broadcast[Array[Array[Array[Double]]]]
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // resolved lazily ON THE EXECUTOR; per-centroid self-dots precomputed
  // once per executor (same fold as the old per-row dot(cv, cv) —
  // deterministic, so bit-identical)
  @transient private lazy val cbs: Array[Array[Array[Double]]] = codebooks.value
  @transient private lazy val selfDots: Array[Array[Double]] =
    cbs.map(_.map(DotImpl.selfDot))

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val len = vec.numElements()
    val m = cbs.length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      val cc = selfDots(j)
      val ds = if (cb.isEmpty) 0 else cb(0).length
      val start = j * ds                      // 0-based subvector start
      val subLen = math.max(0, math.min(ds, len - start))
      var bestDist = 0.0
      var bestIdx = -1
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        // dot(sub, cent) with the fold truncated to the shorter side —
        // exactly dot(slice(vec, start+1, ds), cent)
        val n = math.min(subLen, cent.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += vec.getDouble(start + i) * cent(i); i += 1 }
        val dist = cc(c) - 2.0 * acc
        if (bestIdx < 0 || beats(dist, bestDist)) { bestDist = dist; bestIdx = c }
        c += 1
      }
      out(j) = bestIdx
      j += 1
    }
    new GenericArrayData(out)
  }

  /** `dist` strictly before `bestDist` under Spark's SQL double ordering
    * (NaN greatest, −0.0 == 0.0) — on ties the earlier (smaller) index
    * stays, exactly `array_sort(struct(dist, idx))`'s head.
    */
  private def beats(dist: Double, bestDist: Double): Boolean =
    if (dist == bestDist) false else java.lang.Double.compare(dist, bestDist) < 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_decode(array<int>) -> array<double>`: concatenation of the
  * selected centroids — the corpus-side half of ADC scoring. NULL or
  * out-of-range codes yield NULL, matching the old
  * `flatten(... element_at ...)` chain's null propagation.
  */
case class PqDecode(
    child: Expression,
    codebooks: Broadcast[Array[Array[Array[Double]]]]
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pq_decode requires array<int>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_decode"

  @transient private lazy val cbs: Array[Array[Array[Double]]] = codebooks.value

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), cbs.length)
    var total = 0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= cbs(j).length) return null
      total += cbs(j)(c).length
      j += 1
    }
    val out = new Array[Any](total)
    var pos = 0
    j = 0
    while (j < m) {
      val cent = cbs(j)(codes.getInt(j))
      var i = 0
      while (i < cent.length) { out(pos) = cent(i); pos += 1; i += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqDecode", this, classOf[PqDecode].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      Object r = $self.nullSafeEval($v);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}
