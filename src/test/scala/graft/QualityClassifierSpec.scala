package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PortableLog
import graft.text.QualityClassifier

/** Distributed-LR quality classifier: portable-sigmoid fidelity, an
  * independent driver-side replay of the full training loop, margin
  * identity between the batch and streaming scorers, separation on a
  * learnable corpus, and partitioning-invariance of the trained weights
  * (the quantized-gradient guarantee).
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pexp/psig: ~1e-8 relative fidelity; psig(0) is exactly 0.5") {
    assert(PortableLog.pexp(0.0) == 1.0)
    assert(PortableLog.psig(0.0) == 0.5)
    for (u <- Seq(-30.0, -5.0, -0.7, -1e-4, 1e-4, 0.7, 5.0, 30.0)) {
      val want = math.exp(u)
      val got = PortableLog.pexp(u)
      assert(math.abs(got - want) <= 1e-8 * want, s"pexp($u) = $got vs $want")
    }
  }

  private def corpus = {
    import spark.implicits._
    // positives (y = 1) carry marker tokens; shared filler on both sides
    Seq(
      (1L, "good clean prose text", 1),
      (2L, "good curated prose text", 1),
      (3L, "junk spam noise text", 0),
      (4L, "junk garbled noise text", 0),
      (5L, "", 0)
    ).toDF("doc_id", "text", "y")
  }

  test("training replays driver-side: features, rounds, weights, scores") {
    val qc = QualityClassifier
    val feats = qc.features(corpus, "doc_id", "text", col("y"))
    val m = qc.train(feats)

    // independent replay with plain Scala maps over the same definitions
    def buckets(t: String): Seq[Int] =
      t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).distinct
        .map(tok => (graft.functions.GraftFunctions.hash60Scala(tok) %
          qc.Buckets).toInt).distinct.sorted.toSeq
    val docs = Seq(
      (1L, "good clean prose text", 1.0), (2L, "good curated prose text", 1.0),
      (3L, "junk spam noise text", 0.0), (4L, "junk garbled noise text", 0.0),
      (5L, "", 0.0))
    val fx = docs.map { case (id, t, y) => (id, buckets(t) :+ qc.Buckets, y) }
    var w = Array.fill(qc.Buckets + 1)(0.0)
    for (_ <- 0 until qc.Rounds) {
      val grad = Array.fill(qc.Buckets + 1)(0L)
      fx.foreach { case (_, bs, y) =>
        val s = bs.foldLeft(0.0)((acc, b) => acc + w(b) * 1.0)
        val r = PortableLog.psig(s) - y
        bs.foreach(b => grad(b) += math.floor(r * 1.0 * qc.GradScale).toLong)
      }
      w = Array.tabulate(qc.Buckets + 1) { b =>
        val d = grad(b).toDouble / (qc.GradScale * fx.size.toDouble)
        w(b) - qc.Eta * d
      }
    }
    assert(m.w.toSeq == w.toSeq, "bit-identical weights")

    val got = qc.score(feats, "doc_id", m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    fx.foreach { case (id, bs, _) =>
      val s = bs.foldLeft(0.0)((acc, b) => acc + w(b) * 1.0)
      assert(got(id) == ((math.floor(1.0e6 * s).toLong, if (s >= 0.0) 1 else 0)))
    }
    // the classifier separates the hand corpus
    assert(got(1L)._2 == 1 && got(2L)._2 == 1)
    assert(got(3L)._2 == 0 && got(4L)._2 == 0 && got(5L)._2 == 0)
  }

  test("streaming presence-fold margin is bit-identical to the batch fold") {
    val qc = QualityClassifier
    val feats = qc.features(corpus, "doc_id", "text", col("y"))
    val m = qc.train(feats)
    val batch = qc.score(feats, "doc_id", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stream = qc.scorePresenceFold(corpus, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(batch == stream)
  }

  test("NULL text gets the bias-only margin on BOTH scorers (batch ≡ stream)") {
    import spark.implicits._
    val qc = QualityClassifier
    val m = qc.train(qc.features(corpus, "doc_id", "text", col("y")))
    val withNull = Seq((20L, null.asInstanceOf[String], 0), (21L, "", 0))
      .toDF("doc_id", "text", "y")
    val batch = qc.score(qc.features(withNull, "doc_id", "text", col("y")), "doc_id", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stream = qc.scorePresenceFold(withNull, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(batch == stream, "PERMISSIVE-parsed null-text rows must not split the twins")
    val wantQ = math.floor(qc.ScoreScale * m.w(qc.Buckets)).toLong
    assert(batch.forall(r => r(1) == wantQ), "margin must be bias-only, never NULL")
  }

  test("native margin kernels are bit-identical to the retired HOF folds") {
    import spark.implicits._
    val qc = QualityClassifier
    val m = qc.train(qc.features(corpus, "doc_id", "text", col("y")))
    // presence kernel vs the composable array_sort/distinct/aggregate dag,
    // over the edge cases: empty doc (bias-only), NULL text, duplicate
    // tokens, many buckets, supplementary-plane text (emoji / astral CJK)
    val docs = Seq(
      (1L, "good clean prose text"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "dup dup dup DUP"), (5L, ('a' to 'z').map(c => s"w$c").mkString(" ")),
      (6L, "😀 emoji 😀 𤭢 astral mix"),
      (7L, "tab\tand\nnewline  spaced")).toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
        qc.presenceMarginCol(col("text"), m).as("k"),
        qc.presenceMarginColComposable(col("text"), m).as("h"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"presence kernel diverged on doc ${r.getLong(0)}")
    }
    // feature-array kernel vs the composable fold — including c > 1
    // multiplicities (the general contract, even though presence features
    // are always c = 1) and the bias-only row
    val fx = Seq(
      (1L, Seq((3L, 1L), (7L, 2L), (256L, 1L))),
      (2L, Seq((256L, 1L))),
      (3L, Seq((0L, 5L), (255L, 1L), (256L, 1L))))
      .toDF("doc_id", "raw")
      .select(col("doc_id"), transform(col("raw"),
        p => struct(p.getField("_1").as("b"), p.getField("_2").as("c"))).as("fx"))
    val fxBoth = fx.select(col("doc_id"),
        graft.functions.expressions.LrMarginFold.of(col("fx"),
          typedLit(m.w.toSeq)).as("k"),
        qc.marginColComposable(col("fx"), m.w).as("h"))
      .collect()
    fxBoth.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"margin-fold kernel diverged on row ${r.getLong(0)}")
    }
  }

  test("trained weights are partitioning-invariant (quantized gradients)") {
    val qc = QualityClassifier
    val a = qc.train(qc.features(corpus.repartition(1), "doc_id", "text", col("y")))
    val b = qc.train(qc.features(corpus.repartition(7), "doc_id", "text", col("y")))
    assert(a.w.toSeq == b.w.toSeq)
  }

  test("SAMPLED-fit weights are partitioning-invariant and differ from the full fit") {
    // the round-11 knob: restricting training to the deterministic
    // hash-sample must not break the quantized-gradient invariance (the
    // sample is a pure per-row predicate — partitioning cannot move a
    // doc in or out of it), and it must genuinely change the model
    val qc = QualityClassifier
    val samp = graft.pipeline.Mixing.samplePred("doc_id", 50)
    val a = qc.train(qc.features(corpus.repartition(1), "doc_id", "text", col("y"))
      .filter(samp))
    val b = qc.train(qc.features(corpus.repartition(7), "doc_id", "text", col("y"))
      .filter(samp))
    assert(a.w.toSeq == b.w.toSeq)
    val full = qc.train(qc.features(corpus, "doc_id", "text", col("y")))
    assert(a.w.toSeq != full.w.toSeq, "a 50% sample must change the fit")
  }

  test("AUC by hand: midrank ties, a known non-trivial value, grouped ≡ per-slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // scores with a CROSS-CLASS tie at 10: positives {30, 10}, negatives
    // {10, 10, 5}. Midranks over sorted scores [5, 10, 10, 10, 30]:
    // rank(5)=1, rank(10)=3 (tie group of 3), rank(30)=5. R_pos = 3+5 =
    // 8, U = R_pos - n_pos(n_pos+1)/2 = 8-3 = 5, AUC = 5/(2*3) = 5/6.
    val rows = Seq((1L, 30L, 1), (2L, 10L, 1), (3L, 10L, 0), (4L, 10L, 0),
      (5L, 5L, 0)).toDF("doc_id", "score_q", "y")
    val qc = graft.text.QualityClassifier
    try {
      val got = qc.aucReport(rows, "score_q", col("y")).collect()(0)
      assert((got.getLong(0), got.getLong(1)) == ((2L, 3L)))
      assert(math.abs(got.getDouble(2) - 5.0 / 6.0) < 1e-15,
        s"hand AUC 5/6 expected, got ${got.getDouble(2)}")
      // degenerate slices guard to 0.0
      val onePos = Seq((1L, 3L, 1), (2L, 2L, 1)).toDF("doc_id", "score_q", "y")
      assert(qc.aucReport(onePos, "score_q", col("y"))
        .collect()(0).getDouble(2) == 0.0)
      // grouped report equals the ungrouped report run per slice
      val grouped = rows.withColumn("k", when(col("doc_id") <= 2, "a").otherwise("b"))
        .union(rows.withColumn("k", lit("c")))
      val by = qc.aucReportBy(grouped, "k", "score_q", col("y"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      for (k <- Seq("a", "b", "c")) {
        val slice = grouped.filter(col("k") === k)
        val g = qc.aucReport(slice, "score_q", col("y")).collect()(0)
        assert(by(k) == ((g.getLong(0), g.getLong(1), g.getDouble(2))),
          s"slice $k diverged")
      }
      assert(by("c")._3 == 5.0 / 6.0)
      // invariance: the integer dag cannot depend on partitioning
      val p1 = qc.aucReport(rows.repartition(1), "score_q", col("y")).collect()(0)
      val p7 = qc.aucReport(rows.repartition(7), "score_q", col("y")).collect()(0)
      assert(p1.toSeq == p7.toSeq)
    } finally Caches.releaseAll()
  }

  test("PR curve by hand: thresholds, ties, all-negative recall guard, invariance") {
    import spark.implicits._
    // scores {3,3,2,1}, labels {1,0,1,0}; thresholds sweep the distinct
    // scores: q=3 keeps the tie pair (tp 1 of 2), q=2 keeps three
    // (tp 2 — recall complete), q=1 keeps all four.
    val rows = Seq((1L, 3L, 1), (2L, 3L, 0), (3L, 2L, 1), (4L, 1L, 0))
      .toDF("doc_id", "score_q", "y")
    val qc = graft.text.QualityClassifier
    try {
      val got = qc.prCurve(rows, "score_q", col("y")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
      assert(got(3L) == ((2L, 1L, 1L, 0.5, 0.5)))
      assert(got(2L) == ((3L, 2L, 1L, 2.0 / 3.0, 1.0)))
      assert(got(1L) == ((4L, 2L, 2L, 0.5, 1.0)))
      // no positives anywhere: recall guards to 0.0, precision exact 0
      val neg = Seq((1L, 5L, 0), (2L, 4L, 0)).toDF("doc_id", "score_q", "y")
      val g2 = qc.prCurve(neg, "score_q", col("y")).collect()
        .map(r => (r.getLong(2), r.getDouble(4), r.getDouble(5)))
      assert(g2.forall(_ == ((0L, 0.0, 0.0))))
      // partitioning invariance of the multi-column prefix scan
      val p1 = qc.prCurve(rows.repartition(1), "score_q", col("y"))
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      val p7 = qc.prCurve(rows.repartition(7), "score_q", col("y"))
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      assert(p1.sameElements(p7))
    } finally Caches.releaseAll()
  }

  test("reliability bins and Brier/ECE by hand: exact bins, clamp, telescoped ECE") {
    import spark.implicits._
    val qc = graft.text.QualityClassifier
    // margins chosen for exact psig values: 0.0 → 0.5 (pq 5e8, bin 5);
    // 40.0 → 1.0 in double (1+e^-40 rounds to 1.0 — pq 1e9 CLAMPS into
    // bin 9); -40.0 → psig ≈ 4.2e-18 → pq 0, bin 0.
    val rows = Seq((1L, 0.0, 1), (2L, 0.0, 0), (3L, 40.0, 1), (4L, -40.0, 0))
      .toDF("doc_id", "s", "y")
    try {
      val bins = qc.reliabilityBins(rows, col("s"), col("y")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
      assert(bins.keySet == Set(0L, 5L, 9L), s"bins ${bins.keySet}")
      assert(bins(5L) == ((2L, 1L, 0.5, 0.5, 0.0)), "perfectly calibrated bin")
      assert(bins(9L) == ((1L, 1L, 1.0, 1.0, 0.0)), "clamped psig-1.0 bin")
      assert(bins(0L)._1 == 1L && bins(0L)._2 == 0L && bins(0L)._5 == 0.0)
      // this toy is perfectly calibrated → ECE 0; Brier = mean over docs
      // of (p − y)²: (0.25 + 0.25 + 0 + 0) / 4 = 0.125
      val be = qc.brierEce(rows, col("s"), col("y")).collect()(0)
      assert(be.getLong(0) == 4L)
      assert(be.getDouble(1) == 0.0, s"ECE ${be.getDouble(1)}")
      assert(math.abs(be.getDouble(2) - 0.125) < 1e-9,
        s"Brier ${be.getDouble(2)}")
      // a maximally OVER-confident doc moves ECE: one doc, p = 1.0, y = 0
      val over = Seq((1L, 40.0, 0)).toDF("doc_id", "s", "y")
      val b2 = qc.brierEce(over, col("s"), col("y")).collect()(0)
      assert(b2.getDouble(1) == 1.0 && b2.getDouble(2) == 1.0)
    } finally Caches.releaseAll()
  }
}
