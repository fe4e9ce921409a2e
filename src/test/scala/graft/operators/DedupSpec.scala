package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  /** documents ∪ copy-with-offset-ids: every doc has exactly one duplicate. */
  private lazy val doubled = docs
    .select($"doc_id", $"text")
    .union(docs.select(($"doc_id" + 100000).as("doc_id"), $"text"))
    .cache()

  test("exact dedup keeps one row per text, the lowest id") {
    val deduped = Dedup.exact(doubled, Seq("text"), "doc_id")
    assert(deduped.count() == docs.count())
    assert(deduped.agg(max($"doc_id")).collect().head.getLong(0) < 100000)
  }

  test("duplicateGroups reports keeper and copy count") {
    val groups = Dedup.duplicateGroups(doubled, Seq("text"), "doc_id")
    assert(groups.count() == docs.count())
    assert(groups.where($"n_copies" =!= 2).count() == 0)
  }

  test("keepBest keeps the max-score copy, ties to the smallest id") {
    val rows = Seq(
      (1L, "a", 0.5), (2L, "a", 0.9), (3L, "a", 0.9), // tie at 0.9 → id 2
      (4L, "b", 0.1),                                 // singleton survives
      (6L, "c", 0.3), (5L, "c", 0.3)                  // tie, input order reversed → id 5
    ).toDF("doc_id", "key", "score")
    val kept = Dedup.keepBest(rows, Seq($"key"), $"score", $"doc_id")
      .select($"doc_id", $"key", $"score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(kept == Set((2L, "a", 0.9), (4L, "b", 0.1), (5L, "c", 0.3)))
  }

  test("keepBest on a doubled corpus with a boosted copy keeps the boost") {
    // duplicate every doc; the copy (id+100000) carries the higher score,
    // so unlike exact() the SURVIVORS are all the high-id copies.
    val scored = docs.select($"doc_id", $"text", lit(0.0).as("score"))
      .union(docs.select(($"doc_id" + 100000).as("doc_id"), $"text", lit(1.0).as("score")))
    val kept = Dedup.keepBest(scored, Seq($"text"), $"score", $"doc_id")
    assert(kept.count() == docs.count())
    assert(kept.agg(min($"doc_id")).collect().head.getLong(0) >= 100000)
  }

  test("keepBest-per-cluster completes when the label table exceeds autoBroadcastJoinThreshold") {
    // The doc_near_dup_best composition: LSH pairs → CC labels → left join
    // labels onto the corpus → arg-max per component. On a real crawl the
    // label table is corpus-scale, so the join must NOT depend on a
    // broadcast: with the threshold floored to 1 byte the planner has to
    // pick a shuffled join, and the result must be unchanged.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val corpus = doubled
      val pairs = Dedup.nearDuplicates(corpus, "doc_id", "text", threshold = 0.9)
      val comps = Dedup.connectedComponents(pairs, "id1", "id2")
      val labeled = corpus
        .join(comps, corpus("doc_id") === comps("id"), "left")
        .withColumn("component", coalesce($"component", $"doc_id"))
        .withColumn("quality", lit(1.0))
        .drop("id")
      val kept = Dedup.keepBest(labeled, Seq($"component"), $"quality", $"doc_id")
      val plan = kept.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "label join must survive without a broadcast:\n" + plan)
      // one survivor per component (the corpus has its own near-dups on
      // top of the doubling, so compare against the component count, not
      // docs.count()); quality ties → min id, and every component holds
      // at least one original doc, so no high-id copy survives
      assert(kept.count() == labeled.select($"component").distinct().count())
      assert(kept.agg(max($"doc_id")).collect().head.getLong(0) < 100000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minhash LSH finds every exact duplicate pair (recall on identical text = 1)") {
    val pairs = Dedup.nearDuplicates(doubled, "doc_id", "text", threshold = 0.9)
    val n = docs.count()
    // every (id, id+100000) pair must be found with jaccard 1.0
    val found = pairs.where($"id2" === $"id1" + 100000 && $"jaccard" === 1.0).count()
    assert(found == n, s"found only $found of $n identical pairs")
  }

  test("minhash LSH near-dup matches brute-force jaccard ground truth at 0.9") {
    // the synthetic corpus plants a handful of non-identical near-dup
    // pairs (max jaccard ≈ 0.99); brute-force all pairs driver-side and
    // compare — LSH with 128 hashes / 32 bands has ~100% candidate
    // probability at j >= 0.9, so the sets must match exactly.
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] =
      if (t.length >= 5) (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet else Set(t)
    val sets = texts.map { case (id, t) => id -> shingles(t) }
    val expected = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (idA, a) = sets(i)
      (idB, b) = sets(j)
      jac = (a & b).size.toDouble / (a | b).size
      if jac >= 0.9
    } yield (math.min(idA, idB), math.max(idA, idB))).toSet
    assert(expected.nonEmpty, "fixture should contain planted near-dups")
    val got = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("ngram Jaccard near-dup finds doubled docs") {
    val pairs = Dedup.ngramNearDuplicates(doubled, "doc_id", "text", n = 3, threshold = 0.9)
    val found = pairs.where($"id2" === $"id1" + 100000).count()
    assert(found == docs.count())
  }

  test("simhash near-dup finds identical docs at hamming 0") {
    val pairs = Dedup.simhashNearDuplicates(doubled, "doc_id", "text", maxHamming = 3)
    val found = pairs.where($"id2" === $"id1" + 100000 && $"hamming" === 0).count()
    assert(found == docs.count())
  }

  test("embedding cosine near-dup finds duplicated vectors at cosine 1") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val doubledEmb = emb.union(emb.select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val pairs = Dedup.embeddingNearDuplicates(doubledEmb, "vec_id", "embedding", dim = 64, threshold = 0.999)
    val found = pairs.where($"id2" === $"id1" + 100000).count()
    assert(found == emb.count())
  }

  test("semantic dedup (seed centroids) drops exactly the planted twins, keeps assignments") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val n = emb.count()
    val doubledEmb = emb.union(emb.select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val kept = Dedup.semanticDedup(doubledEmb, "vec_id", "embedding",
      threshold = 0.99, nCentroids = 0, kmeansIterations = 0)
    val rows = kept.collect()
    // survivors = the originals (every twin has a lower-id duplicate)
    assert(rows.length == n)
    assert(rows.forall(_.getLong(0) < 100000))
    // every survivor carries a valid cluster id under √N sizing
    val k = Similarity.autoCentroids(2 * n)
    assert(rows.forall { r => val c = r.getInt(1); c >= 0 && c < k })
    // the within-cluster candidate join must stay an equi-join on the
    // cluster id — never a cartesian/nested-loop over the corpus
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "semantic dedup candidate scope must be a cluster equi-join")
  }

  test("semantic near-dup pairs are cluster-SCOPED: cross-cluster pairs above threshold are not candidates") {
    // seeds (lowest ids) pin the centroids: c0=(1,0), c1=(0,1).
    // v3=(0.8,0.6)→cluster 0, v4=(0.6,0.8)→cluster 1: cosine(v3,v4)=0.96
    // >= 0.95 but cross-cluster → NOT reported (the SemDeDup contract —
    // recall is traded for never comparing across clusters).
    // v5=2·v3 → cluster 0, cosine(v3,v5)=1 → reported.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.8f, 0.6f)), (4L, Seq(0.6f, 0.8f)), (5L, Seq(1.6f, 1.2f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticNearDuplicates(vecs, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 2, kmeansIterations = 0)
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 5L)), s"expected only the co-cluster pair, got $pairs")
  }

  test("semantic near-dup with ONE cluster equals brute-force all-pairs cosine") {
    // nCentroids=1 puts every vector in the same cluster, so the
    // cluster scope is vacuous and the operator must equal an exact
    // all-pairs cosine join — pinning the pair emission + cosine math
    // on NON-planted pairs (the twin gates only exercise cosine≈1)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(100)
    val got = Dedup.semanticNearDuplicates(emb, "vec_id", "embedding",
      threshold = 0.3, nCentroids = 1, kmeansIterations = 0)
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecD = transform($"embedding", x => x.cast("double"))
    val a = emb.select($"vec_id".as("id1"), vecD.as("v1"))
    val b = emb.select($"vec_id".as("id2"), vecD.as("v2"))
    val want = a.crossJoin(b).where($"id1" < $"id2")
      .where(Similarity.cosine($"v1", $"v2") >= 0.3)
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "fixture must produce some pairs at threshold 0.3")
    assert(got == want, s"single-cluster SemDeDup must equal brute force: ${got.size} vs ${want.size}")
  }

  test("semantic near-dup with TRAINED centroids still finds every identical twin") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val doubledEmb = emb.union(emb.select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val pairs = Dedup.semanticNearDuplicates(doubledEmb, "vec_id", "embedding",
      threshold = 0.99, nCentroids = 0, kmeansIterations = 2)
    // identical vectors co-assign under ANY centroid table (same argmax
    // on the same input), so the pair set is invariant to the training
    assert(pairs.where($"id2" === $"id1" + 100000).count() == emb.count())
    assert(pairs.count() == emb.count(), "no non-twin pair reaches 0.99 cosine in the fixture")
  }

  test("containment candidates find a document embedded in another") {
    val docs500 = docs.select($"doc_id", $"text").limit(50)
    val host = docs500.select(
      ($"doc_id" + 200000).as("doc_id"),
      concat(lit("long prefix text before the payload "), $"text", lit(" and a long suffix after it")).as("text"))
    val cands = Dedup.containmentCandidates(docs500.union(host), "doc_id", "text", minShared = 3)
    val found = cands.where($"id2" === $"id1" + 200000).count()
    assert(found == 50, s"expected all 50 embedded docs found, got $found")
    // plan-shape pin (VERDICT r14 #1): the rare-fingerprint bucket guard
    // is an aggregate + broadcast anti-join, NOT a window — a window
    // partitioned on __fp shuffles AND SORTS the whole exploded
    // |docs|×|fps/doc| frame, the shape that killed the sf10 near-dup
    // family before the same fix landed in minhashCandidates
    assert(!cands.queryExecution.executedPlan.toString.contains("Window"),
      "containment bucket guard must not plan a Window over the exploded fingerprint frame")
  }

  test("estimateCut margin scales with signature length and disables below the floor") {
    // classic regime: 6σ < 0.2 at numHashes≈120+ → the documented 0.2 margin
    assert(Dedup.estimateCut(0.9, 120) === 0.7)
    assert(Dedup.estimateCut(0.9, 128) === 0.7)
    // short signatures: the fixed margin would false-drop true pairs at
    // the threshold with ~percent probability (ADVICE r14) — margin
    // widens to 6σ…
    val cut64 = Dedup.estimateCut(0.9, 64)
    assert(math.abs(cut64 - (0.9 - 6.0 * math.sqrt(0.9 * 0.1 / 64))) < 1e-12)
    assert(cut64 < 0.7)
    // …and below the floor the prefilter turns itself off entirely
    assert(Dedup.estimateCut(0.9, 16) === 0.0)
  }

  test("jaccard column is exact set Jaccard") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard($"x", $"y")).collect().head.getDouble(0)
    assert(math.abs(j - 0.5) < 1e-9)
  }

  /** Driver-side brute-force word-trigram jaccard, replicating
    * TextFunctions.tokens + wordShingles semantics.
    */
  private def bruteForceTrigramPairs(threshold: Double): Set[(Long, Long)] = {
    val tokRe = """[\p{L}\p{N}']+""".r
    def grams(t: String): Set[String] = {
      val toks = tokRe.findAllIn(t.toLowerCase).toVector
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val sets = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> grams(r.getString(1)))
    (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (idA, a) = sets(i)
      (idB, b) = sets(j)
      jac = (a & b).size.toDouble / math.max((a | b).size, 1)
      if jac >= threshold
    } yield (math.min(idA, idB), math.max(idA, idB))).toSet
  }

  test("exact prefix-filter join matches brute-force ground truth (recall 1 by construction)") {
    val expected = bruteForceTrigramPairs(0.7)
    assert(expected.nonEmpty, "fixture should contain planted ngram near-dups")
    for (freqOrdered <- Seq(true, false)) {
      val got = Dedup.ngramJaccardJoin(docs, "doc_id", "text", n = 3, threshold = 0.7,
        frequencyOrdered = Some(freqOrdered))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"frequencyOrdered=$freqOrdered diverged from brute force")
    }
  }

  test("exact join finds every identical pair with jaccard 1.0 at threshold 1.0") {
    val pairs = Dedup.ngramJaccardJoin(doubled, "doc_id", "text", n = 3, threshold = 1.0)
    val found = pairs.where($"id2" === $"id1" + 100000 && $"jaccard" === 1.0).count()
    assert(found == docs.count(), "every doubled doc must pair with its copy")
  }

  test("exact join matches brute force across 6 randomized corpora and thresholds (property)") {
    // deterministic RNG: small random set corpora across thresholds,
    // including empty sets, singletons, identical sets, and subsets —
    // the shapes where prefix-length arithmetic is easiest to get wrong
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 6) {
      val threshold = Seq(0.3, 0.5, 0.7, 0.8, 0.9, 1.0)(trial - 1)
      val nDocs = 12 + rnd.nextInt(8)
      val vocab = (1 to 12).map(i => s"tok$i")
      val sets: Seq[(Long, Seq[String])] = (0 until nDocs).map { i =>
        val sz = rnd.nextInt(8) // includes empty
        val s = Seq.fill(sz)(vocab(rnd.nextInt(vocab.size))).distinct
        (i.toLong, s)
      } ++ Seq((100L, Seq("tok1", "tok2", "tok3")), (101L, Seq("tok1", "tok2", "tok3"))) // identical pair
      val expected = (for {
        i <- sets.indices.iterator
        j <- (i + 1) until sets.length
        (ida, a0) = sets(i)
        (idb, b0) = sets(j)
        a = a0.toSet; b = b0.toSet
        jac = if ((a ++ b).isEmpty) 0.0 else (a & b).size.toDouble / (a ++ b).size
        if jac >= threshold
      } yield (math.min(ida, idb), math.max(ida, idb))).toSet
      val df = sets.toDF("id", "s")
      val got = Dedup.exactJaccardJoin(df, "id", "s", threshold,
        frequencyOrdered = Some(trial % 2 == 0))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"trial=$trial threshold=$threshold: got ${got.diff(expected)} extra, missing ${expected.diff(got)}")
    }
  }

  test("exact join prefix filter is not vacuous (prefix rows < total tokens)") {
    // sanity on the bound itself: for t=0.7 the per-doc prefix keeps
    // |s| - ceil(0.7|s|) + 1 tokens, i.e. under ~1/3 of each set
    val sets = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      (2L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "k"))
    ).toDF("id", "s")
    val out = Dedup.exactJaccardJoin(sets, "id", "s", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // |∩|=9, |∪|=11 → j=9/11≈0.818 ≥ 0.7
    assert(out.toSeq == Seq((1L, 2L, math.rint(9.0 / 11 * 1e6) / 1e6)))
  }

  test("connectedComponents labels path, star, and pair graphs with the min id") {
    // path 1-2-3-4-5 (diameter 4: exercises multiple propagation rounds),
    // star 10-{11,12,13}, isolated pair 20-21
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (21L, 20L)
    ).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == expected)
  }

  test("connectedComponents with reliable checkpointing produces identical labels") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2", checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // reliable checkpoints actually landed on stable storage
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("connectedComponents checkpointInterval spans rounds without changing labels") {
    // path 1-..-9: diameter 8 forces ~8 propagation rounds, so interval=3
    // exercises durable rounds, persisted in-between rounds, AND the
    // final-round flush (8 % 3 != 0); interval=1 is the legacy every-round
    // behavior; 8 is the cap (plans double per non-durable round). All
    // three must agree exactly.
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id1", "id2")
    val expected = (1L to 9L).map(_ -> 1L).toMap
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, "id1", "id2",
        checkpointDir = Some("/tmp/x"), checkpointInterval = 9)
    }
    for (interval <- Seq(1, 3, 8)) {
      val dir = java.nio.file.Files.createTempDirectory(s"cc-ckpt-iv$interval").toString
      val got = Dedup.connectedComponents(pairs, "id1", "id2",
          checkpointDir = Some(dir), checkpointInterval = interval)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"interval=$interval")
    }
  }

  test("oversized LSH buckets split instead of dropping: pairs survive, fanout stays linear") {
    // 40 identical docs -> every band puts all 40 in ONE bucket. With
    // maxBucket=10 the old guard dropped the bucket (zero candidates);
    // the split guard sub-buckets by id-hash, so candidates survive and
    // per-(band,sub) fanout is bounded by roughly maxBucket^2, not B^2.
    val clones = (1L to 40L).map(i => (i, "the exact same degenerate boilerplate text repeated"))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(clones, "doc_id", "text", maxBucket = 10)
    val n = cands.count()
    assert(n > 0, "split guard must retain some candidates where the drop guard lost all")
    assert(n < 40L * 39 / 2,
      "oversized bucket must not produce the full quadratic pair set")
    // a corpus with no oversized bucket is byte-identical to the unguarded join
    val distinct = docs.select($"doc_id", $"text").limit(30)
    val guarded = Dedup.minhashCandidates(distinct, "doc_id", "text", maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = Dedup.minhashCandidates(distinct, "doc_id", "text", maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == unguarded)
    // the guard is an aggregate + broadcast of oversized buckets, NOT a
    // window: a window partitioned on (band, bucket) shuffles and sorts
    // the whole docs×bands frame — the r13 sf10 superlinear outlier
    assert(!cands.queryExecution.executedPlan.toString.contains("Window"),
      "bucket-size guard must not plan a Window over the banded frame")
  }

  test("nearDuplicatesAgainst pairs only base × new, matching brute-force cross jaccard") {
    val base = docs.select($"doc_id", $"text")
    val fresh = base.where($"doc_id" < 100)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
    val got = Dedup
      .nearDuplicatesAgainst(base, fresh, "doc_id", "text",
        threshold = 0.9, numHashes = 120, bands = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exhaustive ground truth over the FULL cross product (500 × 100)
    val a = base.select($"doc_id".as("id1"), Dedup.sortedShingleHashes($"text", 5).as("s1"))
    val b = fresh.select($"doc_id".as("id2"), Dedup.sortedShingleHashes($"text", 5).as("s2"))
    val want = a.crossJoin(b)
      .withColumn("j", Dedup.jaccardSortedCol($"s1", $"s2"))
      .where($"j" >= 0.9)
      .select($"id1", $"id2", round($"j", 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"got ${got.size} vs want ${want.size}")
    // the base corpus must never pair with itself, nor new with new
    assert(got.forall { case (i1, i2, _) => i1 < 100000L && i2 >= 100000L })
    // every planted copy finds its original at jaccard 1
    assert(got.count { case (i1, i2, j) => i2 == i1 + 100000L && j == 1.0 } == 100)
  }

  test("guard decision sees a duplicate-saturated corpus that compresses under the stats floor") {
    // a corpus of identical docs dictionary-encodes to almost nothing,
    // so compressed-bytes statistics alone would skip the split guard on
    // EXACTLY the degenerate input it exists for; the bounded row-count
    // probe catches it. AUTO maxBucket grants the GuardProbeSkipDocs
    // cost allowance, so past THAT many clones with tiny stats the
    // bucket-count aggregate must still be planned.
    val clones = (1L to (Dedup.GuardProbeSkipDocs + 100L))
      .map(i => (i, "dup")).toDF("doc_id", "text")
    val guarded = Dedup.minhashCandidates(clones, "doc_id", "text")
    assert(guarded.queryExecution.optimizedPlan.toString.contains("__bucket_n"),
      "AUTO-maxBucket candidates over >GuardProbeSkipDocs docs must plan the split guard " +
        "even when plan statistics undercount a duplicate-saturated corpus")
    // an EXPLICIT maxBucket requests bounding whenever a bucket could
    // exceed it — no cost allowance, even at the default's own value
    val some = (1L to (Dedup.DefaultMaxBucket + 100L)).map(i => (i, "dup")).toDF("doc_id", "text")
    val explicit = Dedup.minhashCandidates(some, "doc_id", "text",
      maxBucket = Dedup.DefaultMaxBucket)
    assert(explicit.queryExecution.optimizedPlan.toString.contains("__bucket_n"),
      "an explicit maxBucket must engage the guard whenever docs exceed it")
    // and the same corpus under AUTO rides the cost allowance: the
    // unguarded join is strictly-higher-recall and cheap at this scale
    val auto = Dedup.minhashCandidates(some, "doc_id", "text")
    assert(!auto.queryExecution.optimizedPlan.toString.contains("__bucket_n"))
    // a provably-small corpus (docs <= maxBucket) always skips
    val tiny = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val skipped = Dedup.minhashCandidates(tiny, "doc_id", "text", maxBucket = 1000)
    assert(!skipped.queryExecution.optimizedPlan.toString.contains("__bucket_n"))
  }

  test("connectedComponents matches union-find ground truth on random graphs") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    assert(got == expected)
  }

  test("connectedComponents tolerates duplicate, reversed and self pairs (r19 loop shape)") {
    // the r19 loop mirrors + adds self-loops and converges on a label-sum
    // fixed point — degenerate inputs (dupes, both orientations, a == b)
    // must neither change labels nor stall convergence
    val pairs = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // duplicate + reversed
      (3L, 3L),                     // self pair: isolated node
      (4L, 5L), (5L, 6L)            // path
    ).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }
}
