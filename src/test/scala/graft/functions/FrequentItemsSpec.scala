package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(items: Seq[String], k: Int, partitions: Int) =
    items.toDF("x").repartition(partitions).select(col("x")).as[String]
      .select(new FrequentItems.MisraGries(k).toColumn).head()

  test("exact regime: distinct <= k gives exact counts with zero error, sorted") {
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(25)("c") ++ Seq.fill(10)("d")
    val out = run(scala.util.Random.shuffle(data), k = 8, partitions = 5)
    assert(out.map(h => h.item -> h.count_lb).toSeq ==
      Seq("a" -> 40L, "b" -> 25L, "c" -> 25L, "d" -> 10L))
    assert(out.forall(h => h.count_ub == h.count_lb), "err must be 0 in the exact regime")
  }

  test("approximate regime: MG guarantees hold under any partitioning") {
    // 1000 items: one at 400, one at 250, tail of 350 distinct singletons
    val data = scala.util.Random.shuffle(
      Seq.fill(400)("hot") ++ Seq.fill(250)("warm") ++ (1 to 350).map(i => s"t$i"))
    val n = data.size
    for (p <- Seq(1, 3, 8)) {
      val out = run(data, k = 4, partitions = p)
      val byItem = out.map(h => h.item -> h).toMap
      // every item with freq > n/(k+1) = 200 must survive
      assert(byItem.contains("hot") && byItem.contains("warm"), s"p=$p lost a heavy hitter")
      // bounds contain the true frequencies
      assert(byItem("hot").count_lb <= 400 && 400 <= byItem("hot").count_ub)
      assert(byItem("warm").count_lb <= 250 && 250 <= byItem("warm").count_ub)
      // the reported undercount never exceeds the MG bound
      out.foreach(h => assert(h.count_ub - h.count_lb <= n / (4 + 1) + 1))
      assert(out.length <= 4)
    }
  }

  test("sketch state stays bounded: at most k entries after any reduce/merge") {
    val agg = new FrequentItems.MisraGries(3)
    var buf = agg.zero
    (1 to 1000).foreach(i => buf = agg.reduce(buf, s"item${i % 7}"))
    assert(buf.items.length <= 3)
    val merged = agg.merge(buf, agg.reduce(agg.reduce(agg.zero, "x"), "x"))
    assert(merged.items.length <= 3)
    // counts stay positive after truncation
    assert(merged.counts.forall(_ > 0))
  }

  test("merge with empty buffers is identity-like and keeps err") {
    val agg = new FrequentItems.MisraGries(4)
    val a = agg.reduce(agg.reduce(agg.zero, "x"), "y")
    assert(agg.merge(a, agg.zero).items.sorted.toSeq == Seq("x", "y"))
    assert(agg.merge(agg.zero, a).items.sorted.toSeq == Seq("x", "y"))
  }
}
