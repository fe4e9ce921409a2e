package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProductQuantizationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus drawn from a tiny per-subspace dictionary: every vector is a
  // concatenation of 4 possible subvector patterns, so a codebook of
  // size >= 4 can represent the corpus EXACTLY
  private def blockyCorpus(n: Int, dim: Int, m: Int) = {
    val ds = dim / m
    (0L until n.toLong).map { id =>
      val v = (0 until dim).map { d =>
        val block = (id + d / ds) % 4 // pattern index per subspace
        (block * 10 + (d % ds)).toFloat
      }.toArray
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  test("codes are m entries bounded by the codebook size") {
    val corpus = blockyCorpus(64, 16, m = 4)
    val cb = ProductQuantization.train(corpus, "vec_id", "embedding", 16, m = 4, k = 8)
    assert(cb.size == 4 && cb.forall(_.size == 8) && cb.forall(_.forall(_.size == 4)))
    val codes = corpus
      .select(ProductQuantization.encode(col("embedding"), cb).as("c"))
      .selectExpr("c").as[Seq[Int]].collect()
    assert(codes.forall(c => c.size == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("an exactly-representable corpus reconstructs exactly and ranks like brute force") {
    val corpus = blockyCorpus(64, 16, m = 4)
    val cb = ProductQuantization.train(corpus, "vec_id", "embedding", 16, m = 4, k = 8,
      iterations = 4)
    val rec = corpus.select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("orig"),
      ProductQuantization.decode(
        ProductQuantization.encode(col("embedding"), cb), cb).as("dec"))
    val maxErr = rec
      .select(aggregate(zip_with(col("orig"), col("dec"), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("e"))
      .agg(max(col("e"))).head.getDouble(0)
    assert(maxErr < 1e-9, s"lossless corpus should reconstruct exactly, maxErr=$maxErr")

    val queries = corpus.where(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
    val pq = ProductQuantization.pqTopK(corpus, queries, "vec_id", "embedding", 5,
      dim = 16, m = 4, codebookSize = 8, iterations = 4)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
    assert(pq == exact)
  }

  test("rerank recall dominates ADC-only recall on unstructured vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select(col("qid"), col("nid"))
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      exact.join(df.select(col("qid"), col("nid"), lit(1).as("hit")), Seq("qid", "nid"), "left")
        .agg(avg(coalesce(col("hit"), lit(0)))).head.getDouble(0)
    val adc = recall(ProductQuantization.pqTopK(emb, queries, "vec_id", "embedding", 10,
      dim = 64, m = 8, codebookSize = 16, iterations = 2))
    val rr = recall(ProductQuantization.pqTopKRerank(emb, queries, "vec_id", "embedding", 10,
      dim = 64, m = 8, codebookSize = 16, iterations = 2, shortlist = 100))
    assert(rr >= adc, s"rerank recall $rr must be >= ADC-only recall $adc")
    assert(rr >= 0.8, s"rerank recall $rr too low for a 100-deep shortlist on 500 vectors")
  }

  test("IVF-PQ: probing every bucket with a deep shortlist recovers high recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select(col("qid"), col("nid"))
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      exact.join(df.select(col("qid"), col("nid"), lit(1).as("hit")), Seq("qid", "nid"), "left")
        .agg(avg(coalesce(col("hit"), lit(0)))).head.getDouble(0)
    // nProbe == nCentroids degenerates IVF away: pure PQ-rerank behavior
    val allProbes = recall(ProductQuantization.ivfPqTopKRerank(
      emb, queries, "vec_id", "embedding", 10, dim = 64, m = 8, codebookSize = 16,
      iterations = 2, nCentroids = 8, nProbe = 8, shortlist = 100))
    assert(allProbes >= 0.8, s"full-probe IVF-PQ recall $allProbes")
    // fewer probes can only lose candidates
    val fewProbes = recall(ProductQuantization.ivfPqTopKRerank(
      emb, queries, "vec_id", "embedding", 10, dim = 64, m = 8, codebookSize = 16,
      iterations = 2, nCentroids = 8, nProbe = 2, shortlist = 100))
    assert(fewProbes <= allProbes + 1e-9)
  }

  test("training and encoding are deterministic") {
    val corpus = blockyCorpus(32, 16, m = 4)
    val cb1 = ProductQuantization.train(corpus, "vec_id", "embedding", 16, m = 4, k = 4)
    val cb2 = ProductQuantization.train(corpus.repartition(5), "vec_id", "embedding", 16, m = 4, k = 4)
    assert(cb1 == cb2)
  }
}
