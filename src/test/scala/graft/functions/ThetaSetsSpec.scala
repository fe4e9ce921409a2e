package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.hashing.byteswap64

/** Exercises [[ThetaSets]] in both regimes: exact (below k, where the
  * gated rel_theta_sets query lives) and approximate (above k, where
  * the DuckDB oracle can't follow — bounds asserted here instead).
  */
class ThetaSetsSpec extends AnyFunSuite {

  // deterministic 64-bit "hash" stream with good dispersion
  private def hashed(ids: Range): Array[Long] =
    ids.map(i => byteswap64(i.toLong * 0x9E3779B97F4A7C15L + 1)).toArray

  private def sketchOf(k: Int, hashes: Array[Long]): Array[Long] =
    hashes.foldLeft(Array.emptyLongArray)((buf, h) => KmvOps.reduce(k, buf, h))

  test("exact regime: all five set cardinalities are exact below k") {
    val k = 1024
    val a = hashed(0 until 600)   // A = [0, 600)
    val b = hashed(400 until 900) // B = [400, 900), overlap 200
    val e = ThetaSets.estimates(k, sketchOf(k, a), sketchOf(k, b))
    assert(e.exact)
    assert(e.nA == 600 && e.nB == 500)
    assert(e.nUnion == 900 && e.nIntersect == 200 && e.nAnotB == 400)
  }

  test("approximate regime: estimates within 5 standard errors") {
    val k = 1024
    val se = 1.0 / math.sqrt(k - 2) // KMV standard error
    val a = hashed(0 until 60000)
    val b = hashed(40000 until 100000) // overlap 20000
    val e = ThetaSets.estimates(k, sketchOf(k, a), sketchOf(k, b))
    assert(!e.exact)
    def check(got: Long, want: Long, label: String): Unit =
      assert(math.abs(got - want).toDouble / want < 5 * se,
        s"$label: got $got want ~$want (tol ${5 * se})")
    check(e.nA, 60000, "nA")
    check(e.nB, 60000, "nB")
    check(e.nUnion, 100000, "union")
    check(e.nIntersect, 20000, "intersect")
    check(e.nAnotB, 40000, "aNotB")
  }

  test("merge is order-insensitive and equals the bulk sketch") {
    val k = 256
    val all = hashed(0 until 5000)
    val (p1, rest) = all.splitAt(1700)
    val (p2, p3) = rest.splitAt(1600)
    val bulk = sketchOf(k, all)
    val m12_3 = KmvOps.merge(k, KmvOps.merge(k, sketchOf(k, p1), sketchOf(k, p2)), sketchOf(k, p3))
    val m3_21 = KmvOps.merge(k, sketchOf(k, p3), KmvOps.merge(k, sketchOf(k, p2), sketchOf(k, p1)))
    assert(m12_3.sameElements(bulk) && m3_21.sameElements(bulk))
  }

  test("disjoint and identical sets hit the boundary cases") {
    val k = 512
    val a = sketchOf(k, hashed(0 until 300))
    val b = sketchOf(k, hashed(1000 until 1200))
    val disjoint = ThetaSets.estimates(k, a, b)
    assert(disjoint.nIntersect == 0 && disjoint.nUnion == 500 && disjoint.nAnotB == 300)
    val same = ThetaSets.estimates(k, a, a)
    assert(same.nIntersect == 300 && same.nUnion == 300 && same.nAnotB == 0)
  }

  test("gated query matches Spark-exact set counts at sf0.001") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val row = graft.SparkEntry.queries("rel_theta_sets")(spark, dir).head()
    val o = spark.read.parquet(s"$dir/orders.parquet")
    def keys(st: String) =
      o.where(col("o_orderstatus") === st).select("o_custkey").distinct()
    val f = keys("F"); val op = keys("O")
    assert(row.getLong(0) == f.count())
    assert(row.getLong(1) == op.count())
    assert(row.getLong(2) == f.union(op).distinct().count())
    assert(row.getLong(3) == f.intersect(op).count())
    assert(row.getLong(4) == f.except(op).count())
  }
}
