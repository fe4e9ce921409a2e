package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 native PQ codec ([[PqEncode]]/[[PqDecode]]) to the
  * pre-r19 higher-order-function chains on randomized adversarial
  * inputs: short/empty vectors (slice truncation), duplicate centroids
  * (tie ordering), negative values. The reference builders below ARE the
  * old implementation, verbatim.
  */
class PqCodecParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- pre-r19 reference implementation (typedlit + HOF chains) ---
  private def refNearestCodeIdx(vec: Column, centLit: Column, nCentroids: Int): Column =
    slice(
      transform(
        array_sort(
          zip_with(
            transform(centLit, cv =>
              graft.operators.Similarity.dot(cv, cv) -
                lit(2.0) * graft.operators.Similarity.dot(vec, cv)),
            sequence(lit(0), lit(nCentroids - 1)),
            (d, idx) => struct(d.cast("double").as("dist"), idx.cast("int").as("idx")))),
        s => s.getField("idx")),
      1, 1).getItem(0)

  private def refEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val ds = codebooks.head.head.size
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      refNearestCodeIdx(
        transform(slice(vec, j * ds + 1, ds), x => x.cast("double")),
        typedlit(cb), cb.size)
    }: _*)
  }

  private def refDecode(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val cbLit = typedlit(codebooks)
    flatten(
      zip_with(codes, sequence(lit(0), lit(codebooks.size - 1)),
        (c, j) => element_at(element_at(cbLit, j + 1), c + 1)))
  }

  test("PqEncode/PqDecode == the pre-r19 HOF chains on randomized inputs") {
    val rnd = new scala.util.Random(191)
    (0 until 4).foreach { trial =>
      val m = 1 + rnd.nextInt(4)          // subspaces
      val ds = 1 + rnd.nextInt(4)         // dims per subspace
      val k = 2 + rnd.nextInt(6)          // centroids per codebook
      val codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map { _ =>
        val base = (0 until k).map(_ =>
          (0 until ds).map(_ => math.rint((rnd.nextDouble() - 0.5) * 8) / 2).toSeq)
        // force ties: duplicate a centroid in half the trials
        if (rnd.nextBoolean() && k >= 2) base.updated(k - 1, base(0)) else base
      }
      val dim = m * ds
      val rows = (0 until 50).map { i =>
        // lengths sweep short/exact/long to exercise slice truncation
        val len = rnd.nextInt(dim + 3)
        (i.toLong, (0 until len).map(_ => ((rnd.nextDouble() - 0.5) * 4).toFloat))
      }
      val df = rows.toDF("id", "vec")
      val got = df.select(
          col("id"),
          graft.operators.ProductQuantization.encode(col("vec"), codebooks).as("codes"))
        .select(col("id"), col("codes"),
          graft.operators.ProductQuantization.decode(col("codes"), codebooks).as("dec"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Double](2)))).toMap
      val want = df.select(col("id"), refEncode(col("vec"), codebooks).as("codes"))
        .select(col("id"), col("codes"), refDecode(col("codes"), codebooks).as("dec"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Double](2)))).toMap
      rows.foreach { case (id, vec) =>
        assert(got(id) == want(id),
          s"trial=$trial id=$id veclen=${vec.length} m=$m ds=$ds k=$k: " +
            s"got=${got(id)} want=${want(id)}")
      }
    }
  }

  test("PqDecode nulls on out-of-range codes like the element_at chain") {
    val codebooks: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    val df = Seq((1L, Seq(0)), (2L, Seq(1)), (3L, Seq(5))).toDF("id", "codes")
    val got = df.select(col("id"),
        graft.operators.ProductQuantization.decode(col("codes"), codebooks).as("dec"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).map(_.asInstanceOf[scala.collection.Seq[_]].toList).contains(List(1.0, 2.0)))
    assert(got(2L).map(_.asInstanceOf[scala.collection.Seq[_]].toList).contains(List(3.0, 4.0)))
    assert(got(3L).isEmpty, "out-of-range code must yield null")
  }
}
