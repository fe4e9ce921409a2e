package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Theta-sketch-style SET EXPRESSIONS over KMV sketches (Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations"; the Apache DataSketches "theta sketch framework" is the
  * same idea): each input set is summarized by its k smallest distinct
  * hashes; union / intersection / difference cardinalities are then
  * estimated from the two tiny sketches alone.
  *
  * Why this matters at 100 TB: `|A ∩ B|` computed exactly is a
  * distinct-join over two huge key sets — two full shuffles. With
  * sketches each side is one map-side-combinable aggregation whose
  * partials are ≤ k longs per partition, the driver combines two
  * ~k-long arrays, and the relative error is ~1/sqrt(k-2). Sketches
  * for every slice (per day, per source, …) can be persisted and
  * combined later without re-reading the data — the reference engine
  * has no counterpart (its aggregation surface stops at exact
  * count/sum, execute_plan.rs), so this is a beyond-reference
  * capability of the same flavor as [[KmvDistinct]].
  *
  * Exactness regime (how the DuckDB gate works): while a sketch holds
  * fewer than k hashes it IS the full distinct hash set, the effective
  * theta is 1, and every estimate below is an exact distinct count —
  * identical to DuckDB's `count(DISTINCT …)` / `INTERSECT` / `EXCEPT`
  * up to 64-bit hash collisions (none in the fixtures).
  */
object ThetaSets {

  /** Estimated cardinalities of A, B, A∪B, A∩B, A∖B from two KMV
    * sketches built with the same k (sorted flipped-hash arrays as
    * produced by [[KmvSketchAgg]]).
    *
    * theta is the EXCLUSIVE retention threshold: for a full sketch the
    * k-th smallest hash normalized to (0,1]; 1.0 for a non-full sketch.
    * Membership of a hash h is known on BOTH sides iff h < min(thetaA,
    * thetaB), so every candidate below that bound is classified exactly
    * and each estimate is count / theta (Horvitz–Thompson on the
    * uniform-hash sample).
    */
  def estimates(k: Int, a: Array[Long], b: Array[Long]): SetEstimates = {
    require(k >= 16, s"k=$k too small for a stable estimate")
    val thetaA = if (a.length < k) 1.0 else KmvOps.normalize(a(k - 1))
    val thetaB = if (b.length < k) 1.0 else KmvOps.normalize(b(k - 1))
    val theta = math.min(thetaA, thetaB)
    val exact = a.length < k && b.length < k

    // flipped-domain exclusive bound matching `theta`; Long.MaxValue for
    // a non-full sketch keeps every retained hash (theta = 1)
    def bound(s: Array[Long]): Long =
      if (s.length < k) Long.MaxValue else s(k - 1)
    val cut = math.min(bound(a), bound(b))

    var i = 0; var j = 0
    var nA = 0L; var nB = 0L; var nBoth = 0L
    while ((i < a.length && (exact || a(i) < cut)) ||
           (j < b.length && (exact || b(j) < cut))) {
      val takeA = i < a.length && (exact || a(i) < cut)
      val takeB = j < b.length && (exact || b(j) < cut)
      if (takeA && takeB && a(i) == b(j)) { nBoth += 1; nA += 1; nB += 1; i += 1; j += 1 }
      else if (takeA && (!takeB || a(i) < b(j))) { nA += 1; i += 1 }
      else { nB += 1; j += 1 }
    }

    def scale(n: Long): Long = if (exact) n else math.round(n / theta)
    SetEstimates(
      nA = scale(nA),
      nB = scale(nB),
      nUnion = scale(nA + nB - nBoth),
      nIntersect = scale(nBoth),
      nAnotB = scale(nA - nBoth),
      exact = exact)
  }

  final case class SetEstimates(
      nA: Long, nB: Long, nUnion: Long, nIntersect: Long, nAnotB: Long,
      exact: Boolean)
}

/** Same buffer algebra as [[KmvDistinct]] but the OUTPUT is the sketch
  * itself (the sorted flipped-hash array), so sketches of different
  * slices can be stored, shipped, and combined with [[ThetaSets]] or
  * [[KmvOps.merge]] without touching the source data again.
  */
final class KmvSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 16, s"k=$k too small for a stable estimate")

  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], hash: Long): Array[Long] =
    KmvOps.reduce(k, buf, hash)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvOps.merge(k, a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
