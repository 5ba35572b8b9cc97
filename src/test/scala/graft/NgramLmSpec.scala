package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PortableLog
import graft.text.NgramLm

/** Bigram-LM scorer: hand-computed model and scores (seen, unseen-bigram,
  * unseen-head smoothing paths), guarded-join result identity, and the
  * degenerate-doc contract.
  */
class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def training = {
    import spark.implicits._
    // bigrams: "a b" ×2, "b a" ×1  (tokens: a×2, b×2 → V = 2)
    Seq((1L, "a b"), (2L, "b a b")).toDF("doc_id", "text")
  }

  private def q(c2: Long, c1: Long, v: Long): Long =
    math.floor(1e6 * PortableLog.plog(
      (c2 + 1L).toDouble / (c1 + v).toDouble)).toLong

  test("model and scores by hand across all three probe paths") {
    import spark.implicits._
    val m = NgramLm.train(training, "text")
    assert(m.v == 2L)
    val seen = m.qSeen.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // c1: a→2, b→3... recount: "a b" tokens a,b; "b a b" tokens b,a,b →
    // a×2, b×3; V=2. bigrams: "a b"×2, "b a"×1.
    assert(seen == Map("a b" -> q(2, 2, 2), "b a" -> q(1, 3, 2)))

    val corpus = Seq(
      (10L, "a b a"), // seen "a b", seen? "b a" seen → both seen
      (11L, "a c"),   // unseen bigram with seen head a (c1=2)
      (12L, "z z"),   // unseen head (c1=0)
      (13L, "solo"),  // < 2 tokens → (0, 0, 0.0)
      (14L, "")
    ).toDF("doc_id", "text")
    val got = NgramLm.score(corpus, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val s10 = q(2, 2, 2) + q(1, 3, 2)
    val s11 = q(0, 2, 2)
    val s12 = q(0, 0, 2)
    assert(got(10L) == ((2L, s10, (-s10).toDouble / (2.0 * 1e6))))
    assert(got(11L) == ((1L, s11, (-s11).toDouble / 1e6)))
    assert(got(12L) == ((1L, s12, (-s12).toDouble / 1e6)))
    assert(got(13L) == ((0L, 0L, 0.0)))
    assert(got(14L) == ((0L, 0L, 0.0)))
    // add-one smoothing quirk, pinned deliberately: an unseen HEAD yields
    // p = 1/V (denominator collapses to V), which can exceed an unseen
    // bigram under a well-attested head (1/(c1+V)) — the classic
    // Laplace-smoothing artifact; a backoff model would order these the
    // other way. Both are negative (improbable) as expected.
    assert(s12 == q(0, 0, 2) && s11 == q(0, 2, 2) && s12 > s11 && s11 < 0L)
  }

  test("stupid backoff by hand: MLE seen path, 0.4 backoff, finite OOV floor") {
    import spark.implicits._
    val m = NgramLm.trainBackoff(training, "text")
    assert(m.n1 == 5L) // tokens: a×2, b×3
    def q(x: Double): Long =
      math.floor(1e6 * PortableLog.plog(x)).toLong
    val corpus = Seq(
      (10L, "a b"),   // seen: c2("a b")=2, c1(a)=2 → MLE 1.0 → q(1)=0
      (11L, "b b"),   // unseen bigram, seen target b → 0.4·(3/5)
      (12L, "a z")    // unseen bigram, OOV target → 0.4·(0/5) → plog(0) floor
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreBackoff(corpus, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(10L) == q(2.0 / 2.0), "attested bigram scores its MLE")
    assert(got(11L) == q(0.4 * (3.0 / 5.0)))
    assert(got(12L) == q(0.4 * (0.0 / 5.0)),
      "OOV bottoms out at the portable log's finite floor")
    assert(got(12L) < -2.0e11 && got(12L) > -2.1e11,
      "the plog(0) floor is ≈ −2.01e5 · 1e6 — finite and deterministic")
  }

  test("multi-order backoff by hand: trigram MLE, one-level and two-level backoff") {
    import spark.implicits._
    // training tokens: a b a b  → c1: a×2 b×2 (N=4); c2: "a b"×2, "b a"×1;
    // c3: "a b a"×1, "b a b"×1
    val m = NgramLm.trainBackoff3(
      Seq((1L, "a b a b")).toDF("doc_id", "text"), "text")
    assert(m.n1 == 4L)
    def q(x: Double): Long =
      math.floor(1e6 * PortableLog.plog(x)).toLong
    val corpus = Seq(
      (10L, "a b a"),  // seen trigram: c3/c2("a b") = 1/2
      (11L, "b a a"),  // unseen trigram; bigram "a a" unseen too → unigram: 0.4·0.4·(2/4)
      (12L, "a a b"),  // unseen trigram; bigram "a b" seen → 0.4·(2/2)
      (13L, "a z q")   // full OOV target → 0.4·0.4·(0/4) → plog(0) floor
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreBackoff3(corpus, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(10L) == q(1.0 / 2.0))
    assert(got(11L) == q(0.4 * (0.4 * (2.0 / 4.0))))
    assert(got(12L) == q(0.4 * (2.0 / 2.0)))
    assert(got(13L) == q(0.4 * (0.4 * (0.0 / 4.0))))
  }

  test("mergeCounts over disjoint slices ≡ train on the union (and survives the store)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    try {
      val docs = Seq((1L, "a b a"), (2L, "b a b c"), (3L, "c a"), (4L, "b b a"))
        .toDF("doc_id", "text")
      val union = NgramLm.train(docs, "text")
      // disjoint halves → counts add → derived model identical
      val merged = NgramLm.modelFromCounts(NgramLm.mergeCounts(
        NgramLm.countTables(docs.filter(col("doc_id") <= 2), "text"),
        NgramLm.countTables(docs.filter(col("doc_id") > 2), "text")))
      assert(merged.v == union.v)
      def rel(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("bigram").collect().map(_.toSeq).toSeq
      assert(rel(merged.qSeen) == rel(union.qSeen),
        "merged q table must equal the union-trained one bit-for-bit")
      // and the store round trip preserves the merge result exactly
      val root = java.nio.file.Files
        .createTempDirectory("graft-lm-merge").toString + "/store"
      NgramLm.saveCounts(spark,
        NgramLm.countTables(docs.filter(col("doc_id") <= 2), "text"), root)
      NgramLm.mergeIntoStore(spark, root,
        NgramLm.countTables(docs.filter(col("doc_id") > 2), "text"))
      val loaded = NgramLm.modelFromCounts(NgramLm.loadCounts(spark, root))
      assert(loaded.v == union.v && rel(loaded.qSeen) == rel(union.qSeen))
      // scoring through the merged model matches the union model
      def sc(m: NgramLm.Model) = NgramLm.score(docs, "doc_id", "text", m)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(sc(loaded) == sc(union))
    } finally Caches.releaseAll()
  }

  test("guarded model join: fallback strategy is result-identical") {
    import spark.implicits._
    val m = NgramLm.train(training, "text")
    val corpus = Seq((10L, "a b a"), (11L, "a c z q")).toDF("doc_id", "text")
    val bcast = NgramLm.score(corpus, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fallback = NgramLm.score(corpus, "doc_id", "text", m, maxBroadcastModel = 0L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(bcast == fallback)
  }

  test("Moore-Lewis contrast: delta equals the two single-model scores exactly") {
    import spark.implicits._
    // in-domain corpus speaks (a b)+; the general corpus speaks (x y)+
    val mIn = NgramLm.train(Seq((1L, "a b a b a")).toDF("doc_id", "text"), "text")
    val mGen = NgramLm.train(Seq((2L, "x y x y")).toDF("doc_id", "text"), "text")
    val corpus = Seq(
      (10L, "a b a"),   // in-domain-looking: ml_q must be positive
      (11L, "x y x"),   // general-looking: ml_q must be negative
      (12L, "a b x y"), // mixed
      (13L, "solo"),    // < 2 tokens → all zeros
      (14L, "q z q z")  // OOV to both sides
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreContrast(corpus, "doc_id", "text", mIn, mGen)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // the contract: lm_in_q/lm_gen_q are EXACTLY what the single-model
    // scorer computes, ml_q their integer difference, ml_xent one
    // division of that difference
    val inS = NgramLm.score(corpus, "doc_id", "text", mIn)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val genS = NgramLm.score(corpus, "doc_id", "text", mGen)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    corpus.collect().map(_.getLong(0)).foreach { d =>
      val (n, li) = inS(d)
      val lg = genS(d)
      val xe = if (n > 0) (lg - li).toDouble / (n.toDouble * 1e6) else 0.0
      assert(got(d) == ((n, li, lg, li - lg, xe)), s"doc $d")
    }
    assert(got(10L)._4 > 0L, "in-domain text must show in-domain advantage")
    assert(got(11L)._4 < 0L, "general text must show general advantage")
    assert(got(13L) == ((0L, 0L, 0L, 0L, 0.0)))
    // partitioning invariance + guarded-fallback identity in one shot
    val again = NgramLm.scoreContrast(corpus.repartition(7), "doc_id", "text",
        mIn, mGen, maxBroadcastModel = 0L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(again == got)
  }

  test("Moore-Lewis generalizes: untrained in-domain docs still score in-domain") {
    import spark.implicits._
    // domain phrase planted on the %5 class; in-domain model trains ONLY
    // on the even half (%10) — the odd half must still score positive
    val docs = (1 to 200).map(i => (i.toLong,
      s"w${i % 7} w${i % 11} w${i % 7}" +
        (if (i % 5 == 0) " mlda mldb mlda mldc mldb" else "")))
      .toDF("doc_id", "text")
    val mIn = NgramLm.train(docs.filter(pmod(col("doc_id"), lit(10)) === 0), "text")
    // general slice excludes the domain class (the declared rows' plant):
    // a general corpus CONTAINING domain docs learns the same phrase
    // conditionals and the contrast washes out
    val mGen = NgramLm.train(docs.filter(pmod(col("doc_id"), lit(4)) === 1 &&
      pmod(col("doc_id"), lit(5)) =!= 0), "text")
    val ml = NgramLm.scoreContrast(docs, "doc_id", "text", mIn, mGen)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val heldOut = (1 to 200).filter(i => i % 5 == 0 && i % 10 != 0)
    val plain = (1 to 200).filter(_ % 5 != 0)
    val heldOutMean = heldOut.map(i => ml(i.toLong)).sum.toDouble / heldOut.size
    val plainMean = plain.map(i => ml(i.toLong)).sum.toDouble / plain.size
    assert(heldOutMean > plainMean,
      s"held-out domain docs ($heldOutMean) must out-score plain docs ($plainMean)")
  }
}
