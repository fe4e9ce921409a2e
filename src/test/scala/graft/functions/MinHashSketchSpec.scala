package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** The 1-byte-per-component signature sketch + agreement estimator that
  * prefilters LSH candidate pairs before exact verification
  * (Dedup.estimateCut).
  */
class MinHashSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pack_low_bytes keeps exactly the low byte of each component") {
    val df = Seq(Seq(0L, 255L, 256L, -1L, 0x1234abcdL)).toDF("sig")
    val packed = df.select(ColumnBridge.column(
      PackLowBytes(ColumnBridge.expression($"sig")))).collect().head.getAs[Array[Byte]](0)
    assert(packed.toSeq == Seq(0, -1, 0, -1, 0xcd.toByte).map(_.toByte))
  }

  test("bytes_fraction_equal is the fraction of matching positions") {
    val df = Seq((Array[Byte](1, 2, 3, 4), Array[Byte](1, 9, 3, 9))).toDF("a", "b")
    val f = df.select(ColumnBridge.column(BytesFractionEqual(
      ColumnBridge.expression($"a"), ColumnBridge.expression($"b")))).collect().head.getDouble(0)
    assert(f == 0.5)
  }

  test("bytes_fraction_equal is 0.0 on length mismatch or empty input") {
    val df = Seq(
      (Array[Byte](1, 2), Array[Byte](1, 2, 3)),
      (Array.empty[Byte], Array.empty[Byte])).toDF("a", "b")
    val fs = df.select(ColumnBridge.column(BytesFractionEqual(
      ColumnBridge.expression($"a"), ColumnBridge.expression($"b")))).collect().map(_.getDouble(0))
    assert(fs.toSeq == Seq(0.0, 0.0))
  }

  test("sketch agreement tracks true jaccard within binomial noise (identical and disjoint docs)") {
    // identical signatures agree exactly; signatures of disjoint shingle
    // sets agree only by the 1/256 byte-collision rate (upward bias — the
    // safe direction for a lower-bound filter)
    val a = Seq.tabulate(120)(i => XXH64.hashLong(i.toLong, 1))
    val b = Seq.tabulate(120)(i => XXH64.hashLong(i + 5000L, 2))
    val df = Seq((a, a), (a, b)).toDF("x", "y")
    def pack(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(PackLowBytes(ColumnBridge.expression(c)))
    val fs = df.select(ColumnBridge.column(BytesFractionEqual(
      ColumnBridge.expression(pack($"x")), ColumnBridge.expression(pack($"y")))))
      .collect().map(_.getDouble(0))
    assert(fs(0) == 1.0)
    assert(fs(1) < 0.1, s"disjoint sketches should agree rarely, got ${fs(1)}")
  }

  private object XXH64 {
    def hashLong(v: Long, seed: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, seed)
  }
}
