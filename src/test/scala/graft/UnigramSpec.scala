package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Unigram
import graft.text.Unigram.{Model, Piece}

/** Unigram-LM tokenizer: hand-traced Viterbi tie-breaking, an
  * INDEPENDENT driver-side replay of the full seed→EM-prune training
  * loop, apply edge cases (empty/NULL text, OOV characters), persistence
  * round trip and partitioning invariance.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scoreOne(text: String, m: Model): (Long, Long, Long) = {
    import spark.implicits._
    val r = Unigram.score(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", m).collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("Viterbi tie-breaking by hand: equal-cost paths pick the smallest split point") {
    // q values hand-picked: [ab] costs 20, [a, b] costs 10+10 = 20 — a
    // TIE. The pinned rule (smallest j wins) keeps the j=0 transition,
    // i.e. the single piece "ab".
    val tie = Model(Seq(Piece("a", 1, -10), Piece("b", 1, -10),
      Piece("ab", 1, -20)), oovQ = -50)
    assert(scoreOne("ab", tie) == ((1L, 1L, -20L)),
      "tie must resolve to the smallest split point (the whole piece)")
    // one cost unit breaks the tie the other way
    val split = Model(Seq(Piece("a", 1, -10), Piece("b", 1, -10),
      Piece("ab", 1, -21)), oovQ = -50)
    assert(scoreOne("ab", split) == ((1L, 2L, -20L)),
      "[a, b] at 20 must beat [ab] at 21")
    // and the reverse: a cheap big piece wins outright
    val whole = Model(Seq(Piece("a", 1, -10), Piece("b", 1, -10),
      Piece("ab", 1, -19)), oovQ = -50)
    assert(scoreOne("ab", whole) == ((1L, 1L, -19L)))
  }

  test("OOV characters fall to the smoothing floor; empty and NULL text score (0, 0, 0)") {
    import spark.implicits._
    val m = Model(Seq(Piece("a", 1, -10), Piece("b", 1, -10),
      Piece("ab", 1, -19)), oovQ = -50)
    // 'x' is outside the alphabet: path a | x | b, x at the OOV floor
    assert(scoreOne("axb", m) == ((1L, 3L, -70L)))
    assert(scoreOne("", m) == ((0L, 0L, 0L)))
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Unigram.score(withNull, "doc_id", "text", m).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 0L, 0L)))
  }

  // ---- independent driver-side replay of the whole training loop ----

  private def refViterbi(w: String, cost: Map[String, Long], oov: Long): Seq[String] = {
    val n = w.length
    val dp = Array.fill(n + 1)(Long.MaxValue); dp(0) = 0L
    val bp = new Array[Int](n + 1)
    for (k <- 1 to n) {
      for (j <- math.max(0, k - Unigram.MaxPieceLen) until k) {
        val piece = w.substring(j, k)
        val c =
          if (k - j == 1) Some(cost.getOrElse(piece, oov))
          else cost.get(piece)
        c.foreach { cc =>
          if (dp(j) != Long.MaxValue && dp(j) + cc < dp(k)) {
            dp(k) = dp(j) + cc; bp(k) = j
          }
        }
      }
    }
    var k = n
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (k > 0) { out += w.substring(bp(k), k); k = bp(k) }
    out.reverse.toSeq
  }

  private def refTrain(docs: Seq[String], rounds: Int): Model = {
    def plogQ(c: Long, n: Long, b: Long): Long =
      math.floor(Unigram.Scale * graft.functions.PortableLog.plog(
        (c + 1L).toDouble / (n + b).toDouble)).toLong
    def rescore(kept: Seq[(String, Long)]): Model = {
      val n = kept.map(_._2).sum; val b = kept.size.toLong
      Model(kept.sortBy(_._1).map { case (p, c) => Piece(p, c, plogQ(c, n, b)) },
        plogQ(0L, n, b))
    }
    def select(counts: Seq[(String, Long)], keep: Int) = {
      val (s1, sm) = counts.partition(_._1.length == 1)
      s1 ++ sm.filter(_._2 > 0L).sortBy { case (p, c) => (-c, p) }.take(keep)
    }
    val words = docs.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val types = words.groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val seed = types.toSeq.flatMap { case (w, c) =>
      for (s <- 0 until w.length;
           l <- 1 to math.min(Unigram.MaxPieceLen, w.length - s))
        yield (w.substring(s, s + l), c)
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }.toSeq
    var m = rescore(select(seed, Unigram.SeedMultis))
    for (_ <- 0 until rounds) {
      val cost = m.pieces.map(p => p.piece -> -p.q).toMap
      val usage = types.toSeq.flatMap { case (w, c) =>
        refViterbi(w, cost, -m.oovQ).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      val counts =
        m.pieces.filter(_.piece.length == 1)
          .map(p => (p.piece, usage.getOrElse(p.piece, 0L))) ++
        usage.filter(_._1.length > 1).toSeq
      m = rescore(select(counts, Unigram.KeepMultis))
    }
    m
  }

  test("supplementary-plane text: codepoint DP — no lone surrogates, coverage holds") {
    import spark.implicits._
    // 😀 (U+1F600) and 𤭢 (U+24B62) are 2 UTF-16 units / 1 codepoint each;
    // a UTF-16-indexed DP would segment surrogate halves and classify the
    // 1-codepoint emoji as a multi-char piece (r12 advice)
    val corpus = Seq((1L, "😀😀ab 𤭢b a😀b"), (2L, "ab 😀😀 ab")).toDF("doc_id", "text")
    val m = Unigram.train(corpus, "text", rounds = 1)
    // all-singles coverage: every 1-CODEPOINT character of the corpus is
    // in the vocabulary, astral ones included
    val singles = m.pieces.map(_.piece)
      .filter(p => p.codePointCount(0, p.length) == 1).toSet
    assert(Set("a", "b", "😀", "𤭢").subsetOf(singles),
      s"astral singles missing from $singles")
    // every trained piece is wellformed UTF-8 (no unpaired surrogate)
    m.pieces.foreach { p =>
      val rt = new String(p.piece.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(rt == p.piece, s"piece ${p.piece} is not UTF-8 wellformed")
    }
    // segmentation pieces concatenate back to each word, and each piece
    // is itself wellformed (the DP never cut inside a surrogate pair)
    val segs = corpus
      .select(explode(graft.functions.GraftFunctions.tokens(col("text"))).as("w"))
      .select(col("w"), graft.functions.expressions.UnigramKernels
        .piecesOf(col("w"), typedLit(m.pieces.map(p => (p.piece, p.q))), m.oovQ)
        .as("ps"))
      .collect()
    segs.foreach { r =>
      val w = r.getString(0)
      val ps = r.getSeq[String](1)
      assert(ps.mkString("") == w, s"pieces $ps != word $w")
      ps.foreach { p =>
        val rt = new String(p.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.charset.StandardCharsets.UTF_8)
        assert(rt == p, s"segment piece $p of $w is not wellformed")
      }
    }
    // stats kernel agrees with Spark's codepoint length accounting:
    // a word of k codepoints yields at most k pieces
    val st = Unigram.score(corpus, "doc_id", "text", m).collect()
    assert(st.forall(_.getLong(2) > 0))
  }

  test("train replays by hand through 0, 1 and 2 EM prune rounds") {
    import spark.implicits._
    val texts = Seq(
      "abab ab abab cd", "cd abab dcba", "ab ab cd cd abab", "xyz abab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (r <- 0 to 2) {
      val got = Unigram.train(docs, "text", rounds = r)
      val want = refTrain(texts, r)
      assert(got.pieces == want.pieces, s"round-$r vocabulary diverged")
      assert(got.oovQ == want.oovQ, s"round-$r OOV floor diverged")
    }
    // the EM round must DO something: pruning changes the vocabulary
    assert(Unigram.train(docs, "text", rounds = 0).pieces !=
      Unigram.train(docs, "text", rounds = 1).pieces)
  }

  test("persistence round trip is value-exact; scoring is partitioning-invariant") {
    import spark.implicits._
    Caches.releaseAll()
    val docs = Seq((1L, "abab ab cd"), (2L, "cd cd abab"), (3L, ""))
      .toDF("doc_id", "text")
    try {
      val m = Unigram.train(docs, "text", rounds = 2)
      val root = java.nio.file.Files
        .createTempDirectory("graft-unigram").toString + "/store"
      Unigram.save(spark, m, root)
      val mL = Unigram.load(spark, root)
      assert(mL.pieces == m.pieces && mL.oovQ == m.oovQ)
      val a = Unigram.score(docs.repartition(1), "doc_id", "text", m)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val b = Unigram.score(docs.repartition(5), "doc_id", "text", mL)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally Caches.releaseAll()
  }
}
