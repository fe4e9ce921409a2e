package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** KLL-style mergeable quantile sketch: values live in levels where
  * level i carries weight 2^i; a level past `k` entries compacts by
  * sorting and promoting every second element to the next level
  * (weight doubles, total weight is preserved exactly — an odd element
  * stays behind, so nothing is ever dropped). Deterministic compaction
  * (always the odd positions) trades the random-pivot unbiasedness of
  * published KLL for run-to-run reproducibility; rank error stays
  * bounded by the per-level halving (~W/k per compacted level).
  *
  * Mergeable: concatenate level-wise, re-compact bottom-up — so it
  * aggregates map-side and at most ~k * levels doubles per partition
  * cross the shuffle: GROUP BY quantiles over 100 TB with bounded state,
  * where exact `percentile()` must shuffle and sort every value.
  *
  * EXACT regime: while no partial ever exceeds k level-0 entries (group
  * count <= k under any partitioning), no compaction happens and
  * [[finish]] returns exact discrete quantiles with the nearest-rank
  * rule `rank = max(1, ceil(q * n))` — bit-identical to DuckDB's
  * `quantile_disc` — which is what the gate pins.
  */
object KllQuantiles {

  /** `minV`/`maxV` are tracked outside the levels (NaN when empty):
    * compaction drops even-position elements, so the literal minimum
    * would not survive otherwise — same choice as production KLL
    * implementations.
    */
  case class KllBuffer(levels: Seq[Seq[Double]], minV: Double, maxV: Double)

  final class Sketch(k: Int, qs: Seq[Double])
      extends Aggregator[Double, KllBuffer, Array[Double]] {
    require(k >= 8, s"k=$k too small for a meaningful sketch")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad quantiles $qs")

    override def zero: KllBuffer = KllBuffer(Seq(Vector.empty), Double.NaN, Double.NaN)

    private def nanMin(a: Double, b: Double) = if (a.isNaN) b else math.min(a, b)
    private def nanMax(a: Double, b: Double) = if (a.isNaN) b else math.max(a, b)

    override def reduce(b: KllBuffer, x: Double): KllBuffer =
      compactCascade(KllBuffer(b.levels.updated(0, b.levels.head :+ x),
        nanMin(b.minV, x), nanMax(b.maxV, x)))

    override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
      val n = math.max(a.levels.size, b.levels.size)
      val lv = (0 until n).map { i =>
        val la = if (i < a.levels.size) a.levels(i) else Vector.empty
        val lb = if (i < b.levels.size) b.levels(i) else Vector.empty
        la ++ lb
      }
      compactCascade(KllBuffer(lv, nanMin(a.minV, b.minV), nanMax(a.maxV, b.maxV)))
    }

    private def compactCascade(b: KllBuffer): KllBuffer = {
      var levels = b.levels.toVector
      var i = 0
      while (i < levels.size) {
        if (levels(i).size > k) {
          val sorted = levels(i).sorted
          // odd element stays behind so total weight is exactly preserved
          val (pairs, rest) =
            if (sorted.size % 2 == 0) (sorted, Vector.empty[Double])
            else (sorted.tail, Vector(sorted.head))
          val promoted = pairs.indices.collect { case j if j % 2 == 1 => pairs(j) }
          levels = levels.updated(i, rest)
          if (i + 1 >= levels.size) levels = levels :+ Vector.empty
          levels = levels.updated(i + 1, levels(i + 1) ++ promoted)
        }
        i += 1
      }
      KllBuffer(levels, b.minV, b.maxV)
    }

    /** Weighted nearest-rank quantiles: rank = max(1, ceil(q * W)). */
    override def finish(b: KllBuffer): Array[Double] = {
      val weighted = b.levels.zipWithIndex.flatMap { case (lv, i) =>
        val w = 1L << i
        lv.map(v => (v, w))
      }.sortBy(_._1)
      if (weighted.isEmpty) return Array.fill(qs.size)(Double.NaN)
      val total = weighted.iterator.map(_._2).sum
      qs.map { q =>
        if (q <= 0.0) b.minV
        else if (q >= 1.0) b.maxV
        else {
          val target = math.max(1L, math.ceil(q * total).toLong)
          var cum = 0L
          var ans = weighted.last._1
          val it = weighted.iterator
          var found = false
          while (it.hasNext && !found) {
            val (v, w) = it.next()
            cum += w
            if (cum >= target) { ans = v; found = true }
          }
          ans
        }
      }.toArray
    }

    override def bufferEncoder: Encoder[KllBuffer] = ExpressionEncoder[KllBuffer]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }
}
