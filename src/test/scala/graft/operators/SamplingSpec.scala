package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("deterministicSample is reproducible and sized k") {
    val a = Sampling.deterministicSample(docs, "doc_id", 10).select($"doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.deterministicSample(docs, "doc_id", 10).select($"doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.size == 10)
    // matches a driver-side reference of the same rule (k smallest md5)
    val expected = docs.select($"doc_id").collect().map(_.getLong(0))
      .sortBy(id => org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString))
      .take(10).sorted.toSeq
    assert(a == expected)
  }

  test("hashSplit assigns stable splits; membership unchanged by corpus growth") {
    val bounds = Seq(("eval", "28"), ("test", "50"))
    val split1 = Sampling.hashSplit(docs, "doc_id", bounds)
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // hex prefix mass: eval ≈ 40/256? '28' => 2*16+8=40/256 ≈ 15.6%, test ≈ next 15.6%
    val n = split1.size
    val evalFrac = split1.values.count(_ == "eval").toDouble / n
    assert(evalFrac > 0.05 && evalFrac < 0.30, s"evalFrac=$evalFrac")
    // growth: doubling the corpus must not move any existing assignment
    val grown = docs.select($"doc_id", $"text")
      .union(docs.select(($"doc_id" + 500000).as("doc_id"), $"text"))
    val split2 = Sampling.hashSplit(grown, "doc_id", bounds)
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split1.forall { case (id, s) => split2(id) == s })
  }

  test("stratifiedSample takes at most k per stratum, deterministically") {
    val s1 = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 3)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.forall(_ <= 3))
    val a = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 3)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratifiedSample(docs, Seq("lang"), "doc_id", 3)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("stratifiedSample equals the naive per-stratum window at every k, incl. skewed strata") {
    // the bucketed (count + prefix-sum + boundary-bucket-only window)
    // implementation must select EXACTLY the k smallest hashes per
    // stratum — the naive full-stratum window's result — at k values
    // hitting empty strata, sub-k strata, bucket-interior and
    // bucket-boundary cutoffs; the skewed frame puts 97% of rows in one
    // stratum (the shape whose single-reducer sort the rewrite removes)
    import org.apache.spark.sql.expressions.Window
    val skewed = spark.range(3000).select(
      $"id".as("doc_id"),
      when($"id" % 33 === 0, "rare").otherwise("big").as("lang"))
    for (k <- Seq(1, 3, 91, 500, 5000)) {
      val got = Sampling.stratifiedSample(skewed, Seq("lang"), "doc_id", k)
        .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val w = Window.partitionBy($"lang").orderBy(md5($"doc_id".cast("string")), $"doc_id")
      val want = skewed.withColumn("__rn", row_number().over(w)).where($"__rn" <= k)
        .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"k=$k: ${got.size} vs ${want.size}")
    }
  }

  test("mixtureSample: membership is deterministic, monotone in the fraction, and growth-stable") {
    val df = spark.range(4000)
      .select($"id", (when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "zh").otherwise("fr")).as("g"))
    def ids(fr: Map[String, Double]) =
      Sampling.mixtureSample(df, "id", "g", fr).select($"id").as[Long].collect().toSet
    val half = ids(Map("en" -> 0.5))
    assert(half == ids(Map("en" -> 0.5)), "must be deterministic")
    // zh/fr keep default 1.0; en is roughly halved
    val enTotal = 1334.0
    val enKept = half.count(_ % 3 == 0).toDouble
    assert(math.abs(enKept / enTotal - 0.5) < 0.06, s"en fraction ${enKept / enTotal}")
    assert(half.count(_ % 3 == 1) == 1333 && half.count(_ % 3 == 2) == 1333)
    // monotone: raising en's weight only ADDS ids
    val threeQ = ids(Map("en" -> 0.75))
    assert(half.subsetOf(threeQ))
    // growth-stable: sampling a subset equals intersecting the sample
    val subset = df.where($"id" < 1000)
    val sampledSubset = Sampling.mixtureSample(subset, "id", "g", Map("en" -> 0.5))
      .select($"id").as[Long].collect().toSet
    assert(sampledSubset == half.filter(_ < 1000))
  }

  test("temperatureMixture: α-flattening keeps low-resource groups at higher rates") {
    // 9:1 head/tail imbalance — α=0.5 must sample the tail at 3× the
    // head's per-row rate (f_i ∝ n_i^(α-1) = 1/sqrt(n_i); sqrt(9) = 3)
    val df = spark.range(10000)
      .select($"id", (when($"id" % 10 < 9, "head").otherwise("tail")).as("g"))
    val kept = Sampling.temperatureMixture(df, "id", "g", targetFraction = 0.3)
      .select($"id", $"g").as[(Long, String)].collect()
    val headRate = kept.count(_._2 == "head").toDouble / 9000.0
    val tailRate = kept.count(_._2 == "tail").toDouble / 1000.0
    assert(math.abs(tailRate / headRate - 3.0) < 0.5,
      s"tail/head rate ratio ${tailRate / headRate}, want ~3")
    // overall volume lands near the target
    assert(math.abs(kept.length / 10000.0 - 0.3) < 0.05, s"total ${kept.length}")
    // deterministic and monotone in targetFraction
    val again = Sampling.temperatureMixture(df, "id", "g", targetFraction = 0.3)
      .select($"id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    val more = Sampling.temperatureMixture(df, "id", "g", targetFraction = 0.5)
      .select($"id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet.subsetOf(more))
  }

  test("temperatureMixture: α=1 is proportional (uniform rate); tiny groups cap at 1.0") {
    val df = spark.range(1000)
      .select($"id", (when($"id" < 995, "big").otherwise("rare")).as("g"))
    // α=1: q_i = p_i, so f_i = targetFraction for every group
    val uniform = Sampling.temperatureMixture(df, "id", "g", targetFraction = 0.4, alpha = 1.0)
      .select($"id").as[Long].collect().toSet
    val direct = Sampling.mixtureSample(df, "id", "g",
      Map("big" -> 0.4, "rare" -> 0.4)).select($"id").as[Long].collect().toSet
    assert(uniform == direct)
    // α=0.5 with a 5-row group: f_rare = min(1, ...) must not exceed 1
    val kept = Sampling.temperatureMixture(df, "id", "g", targetFraction = 0.9)
      .where($"g" === "rare").count()
    assert(kept == 5L, s"rare group must cap at keep-all, got $kept")
  }

  test("tokenBudgetSample: hash-order prefix under budget, bucket-parallel == naive, monotone") {
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "a" else "b", 1L + i % 5))
      .toDF("id", "g", "ntok")
    val got = Sampling.tokenBudgetSample(df, "id", "g", "ntok",
      Map("a" -> 50L, "b" -> 120L)).select($"id").as[Long].collect().toSet
    // naive reference: global per-group cumsum over md5 order, inclusive
    val rows = df.select($"id", $"g", $"ntok").as[(Long, String, Long)].collect()
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = rows.groupBy(_._2).flatMap { case (g, rs) =>
      val budget = Map("a" -> 50L, "b" -> 120L)(g)
      var acc = 0L
      rs.sortBy(r => (md5hex(r._1.toString), r._1)).takeWhile { r =>
        acc += r._3; acc <= budget
      }.map(_._1).toSeq
    }.toSet
    assert(got == expected, s"bucketed != naive: extra=${got -- expected} missing=${expected -- got}")
    // monotone: a bigger budget strictly extends the sample
    val bigger = Sampling.tokenBudgetSample(df, "id", "g", "ntok",
      Map("a" -> 100L, "b" -> 200L)).select($"id").as[Long].collect().toSet
    assert(got.subsetOf(bigger) && bigger.size > got.size)
    // absent group falls back to defaultBudget 0 => excluded entirely
    val only = Sampling.tokenBudgetSample(df, "id", "g", "ntok", Map("a" -> 50L))
      .select($"g").distinct().as[String].collect().toSeq
    assert(only == Seq("a"))
  }

  test("tokenBudgetSample: integer group column and NULL groups draw the default budget") {
    // group is an INT column: the budget map is keyed on the string
    // rendering, and NULL-group rows must receive defaultBudget rather
    // than vanish at the offsets join
    val df = (0L until 60L)
      .map(i => (i, if (i % 5 == 0) None else Some((i % 2).toInt), 1L))
      .toDF("id", "g", "ntok")
    val got = Sampling.tokenBudgetSample(df, "id", "g", "ntok",
      Map("0" -> 10L, "1" -> 10L), defaultBudget = 4L)
    val byGroup = got.groupBy($"g").count().collect()
      .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getLong(1)).toMap
    assert(byGroup == Map(0 -> 10L, 1 -> 10L, -1 -> 4L), s"got $byGroup")
    // defaultBudget 0 drops the NULL group entirely but keeps the others
    val noDefault = Sampling.tokenBudgetSample(df, "id", "g", "ntok",
      Map("0" -> 10L, "1" -> 10L))
    assert(noDefault.where($"g".isNull).count() == 0 && noDefault.count() == 20)
  }

  test("leakageSafeSplit keeps every duplicate cluster inside one split") {
    val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {0,1,2} (chained), {10,11}; everything else singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id1", "id2")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs, "id1", "id2",
      Seq(("eval", "40"), ("test", "80")))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out.size == 50)
    assert(Set(out(0L), out(1L), out(2L)).size == 1, "cluster {0,1,2} crosses splits")
    assert(out(10L) == out(11L), "cluster {10,11} crosses splits")
    // cluster members follow their REPRESENTATIVE's hash (min id)
    val solo = Sampling.hashSplit(docs, "doc_id", Seq(("eval", "40"), ("test", "80")))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out(1L) == solo(0L) && out(11L) == solo(10L))
    // singletons are unchanged vs plain hashSplit — stable membership
    assert((3L until 10L).forall(i => out(i) == solo(i)))
  }
}
