package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al.'s classic
  * KMV estimator): keep the k smallest distinct 64-bit hash values; if
  * fewer than k distinct hashes exist the count is exact, otherwise
  * `n̂ = (k-1) / x_k` where `x_k` is the k-th smallest hash normalized
  * to (0,1). Fully mergeable (union the value sets, keep the k
  * smallest), so it aggregates map-side and only k longs per partition
  * cross the shuffle — the sketch shape for distinct counts over 100 TB
  * when `approx_count_distinct`'s HLL is not wanted (KMV additionally
  * supports set-expression estimates: the k-min union IS the sketch of
  * the union).
  *
  * Input is the 64-bit hash of the value (e.g. `xxhash64(col)`), so the
  * sketch is deterministic for a given column. Standard error ≈
  * `1/sqrt(k-2)` (~4.5% at k=512).
  */
/** Shared buffer algebra for KMV-family sketches: a sketch is the k
  * smallest distinct hash values, stored sorted in UNSIGNED order via a
  * sign-bit flip. Used by both the scalar estimator ([[KmvDistinct]])
  * and the sketch-returning aggregator ([[KmvSketchAgg]]) whose outputs
  * feed set-expression estimation ([[ThetaSets]]).
  */
object KmvOps {
  def flip(h: Long): Long = h ^ Long.MinValue

  /** k-th smallest flipped hash as a fraction of the 64-bit hash space. */
  def normalize(flipped: Long): Double =
    (flipped.toDouble + 9.223372036854776e18) / 1.8446744073709552e19

  def reduce(k: Int, buf: Array[Long], hash: Long): Array[Long] = {
    val f = flip(hash)
    val pos = java.util.Arrays.binarySearch(buf, f)
    if (pos >= 0) buf // duplicate
    else {
      val ins = -pos - 1
      if (buf.length >= k && ins >= k) buf // larger than current k-th min
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = f
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  def merge(k: Int, a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-merge, dedup, cap at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }
}

final class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Long] {
  require(k >= 16, s"k=$k too small for a stable estimate")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], hash: Long): Array[Long] =
    KmvOps.reduce(k, buf, hash)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvOps.merge(k, a, b)

  override def finish(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else {
      // k-th smallest as a fraction of the unsigned 64-bit space
      val x = KmvOps.normalize(buf(k - 1))
      math.round((k - 1) / math.max(x, Double.MinPositiveValue))
    }

  // ExpressionEncoder keeps the partial-merge buffer in Tungsten binary
  // format (a primitive long-array column) — no java-serialization cost
  // on every map-side partial
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
