package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact below k, within error bounds above k, distributed == local") {
    val kmv = new KmvDistinct(512)
    // exact regime: 300 distinct < k
    val small = (1 to 300).map(i => s"v$i").toDF("v")
      .select(xxhash64($"v").as("h")).as[Long]
    assert(small.select(kmv.toColumn).head() == 300L)

    // estimate regime: 50k distinct values (each duplicated)
    val big = ((1 to 50000) ++ (1 to 50000)).map(i => s"item$i").toDF("v")
      .repartition(16)
      .select(xxhash64($"v").as("h")).as[Long]
    val est = big.select(kmv.toColumn).head()
    val err = math.abs(est - 50000.0) / 50000.0
    assert(err < 0.15, s"estimate $est off by ${err * 100}%")

    // merge correctness: distributed (16 partitions) result equals the
    // single-partition result — the sketch is order/partition invariant
    val single = big.coalesce(1).select(kmv.toColumn).head()
    assert(est == single, s"distributed $est != single-partition $single")
  }

  test("monotone under union; k-min union is the sketch of the union") {
    val kmv = new KmvDistinct(64)
    val a = (1 to 5000).map(i => s"a$i").toDF("v").select(xxhash64($"v").as("h")).as[Long]
    val b = (1 to 5000).map(i => s"b$i").toDF("v").select(xxhash64($"v").as("h")).as[Long]
    val estA = a.select(kmv.toColumn).head()
    val estU = a.union(b).select(kmv.toColumn).head()
    assert(estU > estA, "union estimate must exceed a single side's")
  }
}
