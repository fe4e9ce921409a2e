package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra–Gries frequent-items ("heavy hitters") sketch with capacity `k`:
  * at most k counters; a new item either increments its counter, claims a
  * free slot, or (when full) decrements EVERY counter by one, dropping
  * zeros — the classic streaming guarantee that any item occurring more
  * than n/(k+1) times survives, with per-item undercount at most n/(k+1).
  *
  * Mergeable (Agarwal et al., "Mergeable Summaries"): sum counters
  * pairwise, and if more than k survive, subtract the (k+1)-th largest
  * counter value from all and keep the positives. So it aggregates
  * map-side and only ≤k (item, count) pairs per partition cross the
  * shuffle — a full GROUP BY over a 100 TB key column becomes one
  * bounded-state reduction, the sketch shape for "top sources / hottest
  * keys" monitoring where the exact tail is irrelevant.
  *
  * The buffer tracks `err`, the total decrement applied anywhere in the
  * merge tree: every surviving counter `c` bounds the true frequency by
  * `c <= f <= c + err`. When nothing was ever decremented (`err == 0`,
  * i.e. the column's distinct count never exceeded k in any partial) the
  * counts are EXACT — the regime the DuckDB gate pins.
  */
object FrequentItems {

  /** buffer: parallel item/count arrays (kept unordered; ≤ k entries) plus
    * the accumulated decrement bound
    */
  case class MgBuffer(items: Array[String], counts: Array[Long], err: Long)

  case class HeavyHitter(item: String, count_lb: Long, count_ub: Long)

  final class MisraGries(k: Int)
      extends Aggregator[String, MgBuffer, Array[HeavyHitter]] {
    require(k >= 1, s"k=$k must be >= 1")

    override def zero: MgBuffer = MgBuffer(Array.empty, Array.empty, 0L)

    override def reduce(b: MgBuffer, x: String): MgBuffer = {
      val i = b.items.indexOf(x)
      if (i >= 0) {
        val c = b.counts.clone(); c(i) += 1
        MgBuffer(b.items, c, b.err)
      } else if (b.items.length < k) {
        MgBuffer(b.items :+ x, b.counts :+ 1L, b.err)
      } else {
        // decrement-all: the new item and one unit of every counter cancel
        val keepIdx = b.counts.indices.filter(j => b.counts(j) > 1)
        MgBuffer(
          keepIdx.map(b.items).toArray,
          keepIdx.map(j => b.counts(j) - 1).toArray,
          b.err + 1)
      }
    }

    override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
      if (a.items.isEmpty) return MgBuffer(b.items, b.counts, a.err + b.err)
      if (b.items.isEmpty) return MgBuffer(a.items, a.counts, a.err + b.err)
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      var i = 0
      while (i < a.items.length) { m.update(a.items(i), a.counts(i)); i += 1 }
      i = 0
      while (i < b.items.length) {
        m.update(b.items(i), m.getOrElse(b.items(i), 0L) + b.counts(i)); i += 1
      }
      var err = a.err + b.err
      if (m.size > k) {
        // subtract the (k+1)-th largest count from everything, keep positives
        val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        err += cut
        val kept = m.iterator.filter(_._2 > cut).toArray
        MgBuffer(kept.map(_._1), kept.map(_._2 - cut), err)
      } else MgBuffer(m.keys.toArray, m.values.toArray, err)
    }

    override def finish(b: MgBuffer): Array[HeavyHitter] = {
      val hs = b.items.indices.map { i =>
        HeavyHitter(b.items(i), b.counts(i), b.counts(i) + b.err)
      }.toArray
      // deterministic presentation: biggest first, ties by item
      hs.sortBy(h => (-h.count_lb, h.item))
    }

    override def bufferEncoder: Encoder[MgBuffer] = ExpressionEncoder[MgBuffer]()
    override def outputEncoder: Encoder[Array[HeavyHitter]] =
      ExpressionEncoder[Array[HeavyHitter]]()
  }
}
