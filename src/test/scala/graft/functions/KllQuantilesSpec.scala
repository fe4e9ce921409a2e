package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KllQuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def nearestRank(sorted: Seq[Double], q: Double): Double =
    sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)

  test("exact regime: quantiles equal nearest-rank on the sorted data, any partitioning") {
    val data = (1 to 1000).map(i => ((i * 7919) % 1000).toDouble)
    val sorted = data.sorted
    for (p <- Seq(1, 4, 16)) {
      val agg = udaf(new KllQuantiles.Sketch(2048, Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)))
      val got = data.toDF("x").repartition(p)
        .agg(agg($"x")).head.getSeq[Double](0)
      val want = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0).map(nearestRank(sorted, _))
      assert(got == want, s"partitions=$p")
    }
  }

  test("approximate regime: bounded rank error, exact min and max") {
    val n = 50000
    val data = (0 until n).map(i => ((i.toLong * 48271) % n).toDouble)
    val agg = udaf(new KllQuantiles.Sketch(64, Seq(0.0, 0.5, 1.0)))
    val got = data.toDF("x").repartition(8).agg(agg($"x")).head.getSeq[Double](0)
    // min and max survive every compaction exactly
    assert(got.head == 0.0 && got.last == (n - 1).toDouble)
    // median estimate lands within 15% rank error at k=64
    val rank = got(1) / n // values are a permutation of 0..n-1, so value==rank
    assert(math.abs(rank - 0.5) <= 0.15, s"median rank $rank strays too far from 0.5")
  }

  test("buffer stays bounded under heavy input") {
    val agg = new KllQuantiles.Sketch(32, Seq(0.5))
    var buf = agg.zero
    (1 to 10000).foreach(i => buf = agg.reduce(buf, i.toDouble))
    assert(buf.levels.forall(_.size <= 33), "no level may exceed ~k entries")
    assert(buf.levels.size <= 12, "level count grows logarithmically")
    // total weight is never lost
    val w = buf.levels.zipWithIndex.map { case (lv, i) => lv.size.toLong << i }.sum
    assert(w == 10000L)
  }

  test("merge preserves total weight and exactness below k") {
    val agg = new KllQuantiles.Sketch(128, Seq(0.5))
    val a = (1 to 50).foldLeft(agg.zero)((b, i) => agg.reduce(b, i.toDouble))
    val b = (51 to 100).foldLeft(agg.zero)((b2, i) => agg.reduce(b2, i.toDouble))
    val m = agg.merge(a, b)
    assert(agg.finish(m).head == 50.0) // ceil(0.5*100)=50 -> value 50
  }
}
