package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Similarity

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash-LSH finds every high-jaccard pair the exact join finds") {
    val docs = Tables.documents(spark, TestSpark.SF)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.9, maxDf = 1000)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(exact.subsetOf(lsh) || (exact -- lsh).size <= exact.size / 10,
      s"LSH recall too low: missed ${(exact -- lsh).size} of ${exact.size}")
    assert(lsh.subsetOf(exact), "verified LSH pairs must be exact-jaccard pairs (no false positives)")
  }

  test("split-leak pairs are exactly the cross-boundary slice of the pair graph") {
    val docs = Tables.documents(spark, TestSpark.SF)
    val thr = graft.pipeline.Mixing
      .splitThresholds(Seq(("train", 80), ("eval", 20))).head._2
    val leaks = Dedup.splitLeakPairs(docs, "doc_id", "text",
        evalSide = graft.pipeline.Mixing.mixHash("doc_id") >= lit(thr))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the full verified pair graph, both directions, filtered
    // to (train, eval) orientation by the same hash dag
    val all = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("a_id", "b_id").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val evalIds = {
      import spark.implicits._
      all.flatMap(p => Seq(p._1, p._2)).distinct.toSeq.toDF("doc_id")
        .filter(graft.pipeline.Mixing.mixHash("doc_id") >= lit(thr))
        .collect().map(_.getLong(0)).toSet
    }
    val want = all.filter { case (a, b) => !evalIds(a) && evalIds(b) }.toSet
    assert(leaks == want,
      "leak edges must be exactly the cross-boundary pairs, train -> eval")
    assert(leaks.forall { case (a, b) => !evalIds(a) && evalIds(b) })
  }

  test("simhash hamming distance is small exactly for near-dup pairs") {
    val docs = Tables.documents(spark, TestSpark.SF)
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), "doc_id", maxHamming = 10)
    assert(pairs.count() > 0)
  }

  test("banded LSH pairs are a superset of single-bucketing pairs") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(Similarity.embeddingPairsLsh(emb, "vec_id", "embedding", 0.4))
    val banded = pairs(Similarity.embeddingPairsLshBanded(emb, "vec_id", "embedding", 0.4))
    assert(single.subsetOf(banded),
      s"band 0 reuses the single bucketing's planes; missing ${(single -- banded).size}")
    // and every banded pair is a true near-dup (threshold-verified)
    val exact = pairs(Similarity.embeddingPairs(emb, "vec_id", "embedding", 0.4))
    assert(banded.subsetOf(exact), "verify pass must keep only true pairs")
  }

  test("integer PageRank: hand replay on a star, hub outranks spokes, isolated closed form") {
    import spark.implicits._
    // star: 1 is the hub of 2..5; (8, 9) an isolated pair; 99 off-graph
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (8L, 9L))
      .toDF("a_id", "b_id")
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L, 99L)).toDF("doc_id")
    val got = Dedup.pageRank(nodes, "doc_id", pairs, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact integer replay
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 8L -> 9L)
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    var pr = deg.keys.map(_ -> 1000000L).toMap
    (1 to 6).foreach { _ =>
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = deg.keys.map(v => v -> (150000L + 17L * inflow.getOrElse(v, 0L) / 20L)).toMap
    }
    val want = pr ++ Map(99L -> 150000L)
    assert(got == want, s"pagerank must replay the integer rounds: $got vs $want")
    assert(got(1L) > got(2L), "the hub must outrank its spokes")
    assert(got(2L) == got(3L) && got(3L) == got(4L), "spokes are symmetric")
    assert(got(99L) == 150000L, "off-graph nodes take the closed form")
    assert(got(8L) == got(9L), "a symmetric pair stays uniform")
    // partitioning invariance (integer arithmetic end to end)
    val again = Dedup.pageRank(nodes.repartition(5), "doc_id",
        pairs.repartition(3), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("connected components produce transitive representatives") {
    import spark.implicits._
    val ids = spark.createDataset(1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val reps = Dedup.connectedComponents(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("PCA power iteration recovers a planted dominant direction; projections replay") {
    import spark.implicits._
    val dim = 8
    // planted direction e_3 with ±4 mass; orthogonal noise at ±0.5 on a
    // rotating coordinate — the second moment is decisively dominated
    val rows = (1 to 200).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(2) = if (i % 2 == 0) 4.0f else -4.0f
      v((i % 5) + 3) = if (i % 3 == 0) 0.5f else -0.5f
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val g = Similarity.gramQuantized(df, "embedding")
    // driver replay of the quantized Gram: order-free integer sums
    val wantG = Array.tabulate(dim * dim) { k =>
      val (i, j) = (k / dim, k % dim)
      rows.map { case (_, v) =>
        math.floor(1.0e6 * (v(i).toDouble * v(j).toDouble)).toLong
      }.sum
    }
    assert(g.toSeq == wantG.toSeq, "gram must be the exact quantized sums")
    // partitioning invariance (integer sums)
    assert(Similarity.gramQuantized(df.repartition(7), "embedding").toSeq
      == wantG.toSeq)
    val u = Similarity.pcaTopDirection(g, dim)
    assert(math.abs(math.abs(u(2)) - 1.0) < 1e-3,
      s"dominant direction must be ~e_3: ${u.toSeq}")
    val norm = math.sqrt(u.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12, "direction must be unit-norm")
    // projection + residual replay for a few rows (the exact same folds)
    val got = Similarity.pcaProject(df, "vec_id", "embedding", u)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    rows.take(5).foreach { case (id, v) =>
      var proj = 0.0
      var nsq = 0.0
      v.indices.foreach { i =>
        proj += v(i).toDouble * u(i)
        nsq += v(i).toDouble * v(i).toDouble
      }
      assert(got(id) == ((proj, nsq - proj * proj)), s"vec $id")
    }
    // all-but-the-top semantics: the residual never goes negative, and a
    // vector ON the direction keeps ~nothing
    assert(got.values.forall(_._2 >= -1e-9))
    val pure = Seq((999L, Array.fill(dim)(0.0f).updated(2, 4.0f).toSeq))
      .toDF("vec_id", "embedding")
    val pr = Similarity.pcaProject(pure, "vec_id", "embedding", u).head()
    assert(math.abs(pr.getDouble(2)) < 1e-2,
      "a vector on the dominant direction must lose ~all mass to the projection")
  }

  test("top-2 deflation: second direction finds the second planted component") {
    import spark.implicits._
    val dim = 8
    // e_3 at ±4 (dominant), e_6 at ±2 (second), rotating ±0.25 noise
    val rows = (1 to 240).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(2) = if (i % 2 == 0) 4.0f else -4.0f
      v(5) = if (i % 3 == 0) 2.0f else -2.0f
      v(i % 2) = if (i % 5 == 0) 0.25f else -0.25f
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val g = Similarity.gramQuantized(df, "embedding")
    val (u1, u2) = Similarity.pcaTop2(g, dim)
    assert(math.abs(math.abs(u1(2)) - 1.0) < 1e-3, s"u1 must be ~e_3: ${u1.toSeq}")
    assert(math.abs(math.abs(u2(5)) - 1.0) < 1e-2, s"u2 must be ~e_6: ${u2.toSeq}")
    // near-orthogonal after deflation (up to the fixed rounds)
    val ip12 = u1.zip(u2).map { case (a, b) => a * b }.sum
    assert(math.abs(ip12) < 1e-2, s"u1/u2 must be near-orthogonal: $ip12")
    // a vector in span{e_3, e_6} keeps ~no residual mass
    val got = Similarity.pcaProject2(
        Seq((999L, Array.fill(dim)(0.0f).updated(2, 4.0f).updated(5, 2.0f).toSeq))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", u1, u2).head()
    assert(math.abs(got.getDouble(3)) < 0.05,
      s"span{u1,u2} vector must project ~fully: resid ${got.getDouble(3)}")
  }

  test("knn rank-1 neighbor has the maximal cosine") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val knn = Similarity.knnBruteForce(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 3)
      .collect()
    val byQuery = knn.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getDouble(3)).toSeq == sorted.map(_.getDouble(3)).sortBy(-_).toSeq)
    }
    assert(byQuery.size == 5)
  }

  test("LSH knn neighbors share the query's hyperplane bucket") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val buckets = Similarity.hyperplaneBuckets(emb, "vec_id", "embedding", planes = 6, dim = 64)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val knn = Similarity.knnLsh(emb, "vec_id", "embedding", k = 3,
      queryFilter = col("vec_id") < 20).collect()
    knn.foreach { r =>
      assert(buckets(r.getLong(0)) == buckets(r.getLong(2)))
    }
  }

  test("hot-bucket guard bounds a pathological all-identical corpus") {
    // 2000 identical vectors land in ONE hyperplane bucket: unguarded, the
    // self-join emits ~2M pairs (n²/2); with maxBucket=100 the bucket is
    // sub-split into ~20 deterministic salts, bounding it near n·cap/2.
    val n = 2000
    val df = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 8).map(j => lit(0.5 + j * 0.01)): _*).as("embedding"))
    val guarded = Similarity.embeddingPairsLsh(df, "vec_id", "embedding",
      threshold = -1.0, planes = 4, dim = 8, maxBucket = 100).count()
    assert(guarded > 0)
    assert(guarded < n.toLong * 150,
      s"guarded pair count $guarded suggests the self-join went quadratic")
    val banded = Similarity.embeddingPairsLshBanded(df, "vec_id", "embedding",
      threshold = -1.0, planes = 4, bands = 3, dim = 8, maxBucket = 100).count()
    assert(banded > 0 && banded < n.toLong * 150,
      s"banded guarded pair count $banded suggests a quadratic join")
  }

  test("semantic dedup: flagged reps are true cosine near-dups; identical vectors collapse") {
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val sem = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 8, iters = 1, threshold = 0.4)
    val flagged = sem.filter(col("is_sem_dup") === 1)
      .select("rep_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.embeddingPairs(emb, "vec_id", "embedding", 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision: every (rep, vec) pair the cells produced is a true
    // >= threshold cosine pair (recall is forfeited across cells by
    // construction — the SemDeDup trade)
    flagged.foreach { case (a, b) =>
      assert(exact.contains((a, b)), s"($a,$b) flagged but not a true near-dup")
    }
    // an all-identical corpus collapses to the min id: one cell, cos = 1
    val n = 50
    val same = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 8).map(j => lit(0.1 * (j + 1))): _*).as("embedding"))
    val collapsed = Similarity.semanticDedup(same, "vec_id", "embedding",
      k = 4, iters = 1, threshold = 0.9)
    assert(collapsed.filter(col("rep_id") =!= 0L).isEmpty)
  }

  test("exact span dedup: rep is the minimum doc sharing a k-token span") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a b c d e f g h unique tail ten"),    // owns span a..h
      (20L, "prefix words a b c d e f g h more"),  // shares a..h with 10
      (30L, "totally different words with no shared span here"),
      (40L, "short doc"),                          // < k tokens: no spans
      (50L, "more stuff then a b c d e f g h end") // shares a..h → rep 10
    ).toDF("doc_id", "text")
    val got = Dedup.spanRepresentatives(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(10L) == ((10L, 0)), "first owner is its own rep")
    assert(got(20L) == ((10L, 1)), "span sharer points at the min owner")
    assert(got(30L) == ((30L, 0)), "unshared spans keep the doc")
    assert(got(40L) == ((40L, 0)), "sub-k docs have no spans and survive")
    assert(got(50L) == ((10L, 1)), "min over ALL sharers, not pairwise order")
  }

  test("span dedup stays linear on a pathological all-identical corpus") {
    // 2000 identical docs share every span: a candidate-pair design would
    // enumerate ~2·10⁶ pairs here (and df² generally); the per-span-min
    // factoring moves |distinct spans| aggregation rows plus |doc spans|
    // linear join rows, and every rep collapses to the min id.
    import spark.implicits._
    val n = 2000
    val df = spark.range(n).select(col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta eta theta iota kappa").as("text"))
    val got = Dedup.spanRepresentatives(df, "doc_id", "text", k = 8)
    assert(got.count() == n)
    assert(got.filter(col("rep_id") =!= 0L).isEmpty,
      "all identical docs must collapse to rep 0")
    assert(got.filter(col("doc_id") > 0L && col("is_span_dup") =!= 1).isEmpty)
  }

  test("span scrubbing cuts exactly the earlier-owned spans, keeps the rest") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h i j"), // owner of span a..h (and its tail spans)
      (1L, "x a b c d e f g h z"), // shares a..h at pos 1-8 → keeps "x z"
      (2L, "a b c d e f g h i j"), // full duplicate → scrubbed to nothing
      (3L, "p q r s t u v w"), // unique 8-token doc → untouched
      (4L, "tiny doc"), // sub-k: no spans, untouched
      (5L, "m1 m2 m3 m4 m5 m6 m7 m8 m1 m2 m3 m4 m5 m6 m7 m8")
      // within-doc repeat ONLY: first owner is doc 5 itself, and the rule
      // cuts only spans owned by an EARLIER doc — untouched
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.scrubSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(got(0L) == ((10, 0, "a b c d e f g h i j")), "owner keeps its spans")
    assert(got(1L) == ((2, 8, "x z")), "only the shared span's tokens are cut")
    assert(got(2L) == ((0, 10, "")), "full duplicate scrubs to empty")
    assert(got(3L) == ((8, 0, "p q r s t u v w")))
    assert(got(4L) == ((2, 0, "tiny doc")), "sub-k docs have no spans")
    assert(got(5L)._2 == 0, "within-doc repeats are not cross-doc duplicates")
    Caches.releaseAll()
  }

  test("stream-safe band column equals the aggregate band table") {
    import graft.functions.GraftFunctions.{hash60, wordShingles}
    val docs = Tables.documents(spark, TestSpark.SF)
    val hs = docs.select(col("doc_id"),
      transform(wordShingles(col("text"), 3), g => hash60(g)).as("hs"))
    val agg = Dedup.lshBands(Dedup.minhashSignatures(hs, "doc_id", 12), "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val colForm = hs
      .select(col("doc_id"), explode(Dedup.lshBandsColumn(
        graft.functions.expressions.MinHashSigs.of(col("hs"), 12), 12, 3)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bandsig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg == colForm,
      "per-row band expression must reproduce the groupBy band table exactly")
    assert(agg.nonEmpty)
  }

  test("bloom membership is exact at any fpp and on both join strategies") {
    import spark.implicits._
    val trDg = Seq("alpha body", "beta body", "gamma body").toDF("text")
      .select(md5(col("text")).as("dg"))
    val nw = Seq((1L, "alpha body"), (2L, "fresh one"), (3L, "beta body"),
      (5L, "fresh two")).toDF("doc_id", "text")
    val expected = Map(1L -> 1, 2L -> 0, 3L -> 1, 5L -> 0)
    // fpp = 0.5 floods the probe with false positives; maxBloomItems = 0
    // forces the guarded fallback — the md5 verify must make every
    // combination produce the identical exact flags
    for (fpp <- Seq(0.01, 0.5); maxItems <- Seq(Dedup.MaxBloomItems, 0L)) {
      val got = Dedup.bloomMembership(nw, "doc_id", "text", trDg,
        fpp = fpp, maxBloomItems = maxItems)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"fpp=$fpp maxBloomItems=$maxItems")
      Caches.releaseAll()
    }
  }

  test("bloom probe has no false negatives; only the fast path plans it") {
    val trDg = spark.range(1000).select(md5(col("id").cast("string")).as("dg"))
    val bf = trDg.stat.bloomFilter(
      graft.functions.GraftFunctions.hash60(col("dg")), 1000L, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val misses = trDg.filter(!graft.functions.expressions.BloomMightContainLong.of(
        bc, graft.functions.GraftFunctions.hash60(col("dg"))))
      .count()
    assert(misses == 0, "a Bloom filter must never produce a false negative")
    val d = Tables.documents(spark, TestSpark.SF)
    val dg = d.select(md5(col("text")).as("dg"))
    val fast = Dedup.bloomMembership(d, "doc_id", "text", dg)
    assert(fast.queryExecution.executedPlan.toString.contains("bloom_might_contain_long"),
      "fast path must probe the Bloom filter")
    Caches.releaseAll()
    val fb = Dedup.bloomMembership(d, "doc_id", "text", dg, maxBloomItems = 0L)
    assert(!fb.queryExecution.executedPlan.toString.contains("bloom_might_contain_long"),
      "fallback path must not build or probe a filter")
    Caches.releaseAll()
  }

  test("SortedJaccard: hand cases, builtin agreement, codegen survival") {
    import graft.functions.expressions.SortedJaccard
    import graft.functions.GraftFunctions.wordShingles
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // hand cases: identical, disjoint, partial overlap, one empty, both
      // empty (defined 0.0), and the long-element flavor — several
      // jaccards in ONE projection so generated locals must not collide
      def arr(xs: String*) = array(xs.map(lit): _*).cast("array<string>")
      val hand = spark.range(1).select(
        SortedJaccard.of(arr("a", "b", "c"), arr("a", "b", "c")).as("same"),
        SortedJaccard.of(arr("a", "b"), arr("c", "d")).as("disj"),
        SortedJaccard.of(arr("a", "b", "c"), arr("b", "c", "d")).as("part"),
        SortedJaccard.of(arr(), arr("a")).as("half_empty"),
        SortedJaccard.of(arr(), arr()).as("both_empty"),
        SortedJaccard.of(
          array(lit(1L), lit(5L), lit(9L)), array(lit(5L), lit(9L), lit(11L)))
          .as("longs")).head()
      assert(hand.getDouble(0) == 1.0)
      assert(hand.getDouble(1) == 0.0)
      assert(hand.getDouble(2) == 2.0 / 4.0)
      assert(hand.getDouble(3) == 0.0)
      assert(hand.getDouble(4) == 0.0)
      assert(hand.getDouble(5) == 2.0 / 4.0)
      // bit-agreement with the spelled-out builtin rendering over real
      // shingle sets (same single IEEE division) — the contract that lets
      // the near-dup verify rows keep their existing oracles
      val docs = Tables.documents(spark, TestSpark.SF).limit(50)
        .select(col("doc_id"), sort_array(wordShingles(col("text"), 3)).as("sh"))
      val pairs = docs.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
        .join(docs.select(col("doc_id").as("b_id"), col("sh").as("sh_b")),
          col("a_id") < col("b_id"))
      val mism = pairs.select(
        SortedJaccard.of(col("sh_a"), col("sh_b")).as("fused"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b")))).cast("double"))
          .as("spelled"))
        .filter(col("fused") =!= col("spelled")).count()
      assert(mism == 0, s"fused jaccard diverged from builtin on $mism pairs")
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("IVF-PQ: recall vs brute force, partitioning invariance, compressed index schema") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val got = Similarity.knnIvfPq(emb, "vec_id", "embedding", k = 5,
        queryFilter = col("vec_id") < 100, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._1).distinct.length == 100, "every query answers")
    // recall@5 against the exact answer: IVF-PQ is nprobe/rerank-bounded
    // approximate — the coarse cells and ADC candidate cut both lose
    // true neighbors by design; the floor checks the chain is sane, not
    // tight (the draw is deterministic, so this is a fixed property)
    val exact = Similarity.knnBruteForce(emb.filter(col("vec_id") < 100), emb,
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = got.count { case (q, _, n) => exact(q).contains(n) }
    // the coarse index caps recall (a true neighbor outside the nprobe
    // cells is lost before PQ sees it): compare against trained IVF with
    // the SAME cells and exact scoring — the PQ chain (ADC cut + rerank)
    // should be nearly lossless relative to that ceiling
    val ivfHits = Similarity.knnIvf(emb, "vec_id", "embedding", k = 5,
        numCentroids = 16, queryFilter = col("vec_id") < 100,
        centroids = Some(Similarity.kmeansCentroidsQuantized(
          emb, "vec_id", "embedding", k = 16, iters = 2)), nprobe = 3)
      .collect().count(r => exact(r.getLong(0)).contains(r.getLong(2)))
    info(s"IVF-PQ recall@5 = $hits/500 vs exact-scored IVF ceiling $ivfHits/500")
    assert(hits >= (ivfHits * 8) / 10,
      s"ADC+rerank lost too much vs the coarse ceiling: $hits vs $ivfHits")
    assert(hits >= 150, s"IVF-PQ recall collapsed: $hits/500")
    // deterministic under repartitioning (trained books + fixed dags)
    val emb13 = emb.repartition(13)
    val again = Similarity.knnIvfPq(emb13, "vec_id", "embedding", k = 5,
        queryFilter = col("vec_id") < 100, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.sorted.toSeq == got.sorted.toSeq,
      "IVF-PQ must be partitioning-invariant end to end")
  }
}
