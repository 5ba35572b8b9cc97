package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{CorpusStats, TextAnalysis}

/** Hand-computed cases for the corpus-frequency scorer and the line-wise
  * cleaner (the declared rows run over the synthetic corpus; these pin the
  * arithmetic on inputs small enough to verify by hand).
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "solo"),
      (4L, "")
    ).toDF("doc_id", "text")
  }

  test("collocations: hand PMI, sticky pair outranks common-but-independent pair") {
    import spark.implicits._
    import graft.functions.PortableLog
    // "alpha beta" always co-occur (sticky); "x"/"y" are common but meet
    // only sometimes; singles pad N. One doc per line keeps bigram
    // bookkeeping trivial.
    val docs = (
      Seq.fill(8)("alpha beta") ++
      Seq.fill(20)("x pad1 y") ++
      Seq.fill(6)("x y") ++
      Seq.fill(30)("pad2 pad3")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.text.CorpusStats.collocations(docs, "text", k = 10,
        minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // hand replay: token counts and N
    val c1 = Map("alpha" -> 8L, "beta" -> 8L, "x" -> 26L, "y" -> 26L,
      "pad1" -> 20L, "pad2" -> 30L, "pad3" -> 30L)
    val n = c1.values.sum
    def pmiQ(c2: Long, a: String, b: String): Long =
      math.floor(1.0e6 * PortableLog.plog(
        (c2.toDouble * n.toDouble) / (c1(a).toDouble * c1(b).toDouble))).toLong
    val want = Seq(
      ("alpha beta", 8L, pmiQ(8, "alpha", "beta")),
      ("x pad1", 20L, pmiQ(20, "x", "pad1")),
      ("pad1 y", 20L, pmiQ(20, "pad1", "y")),
      ("x y", 6L, pmiQ(6, "x", "y")),
      ("pad2 pad3", 30L, pmiQ(30, "pad2", "pad3"))
    ).sortBy(t => (-t._3, t._1))
    assert(got.toSeq == want, s"got ${got.toSeq}")
    assert(got.head._1 == "alpha beta",
      "the always-together pair must carry the highest PMI")
    assert(pmiQ(8, "alpha", "beta") > pmiQ(6, "x", "y"),
      "sticky beats common-but-independent")
  }

  test("zipf profile: planted power law scores ~-1, uniform text does not") {
    import spark.implicits._
    // zipf source: token w_r appears floor(1000/r) times, r = 1..60 — a
    // textbook power law; uniform source: 60 tokens at 17 each
    def spread(counts: Seq[(String, Int)]): String =
      counts.flatMap { case (t, c) => Seq.fill(c)(t) }.mkString(" ")
    val zipfText = spread((1 to 60).map(r => (s"w$r", 1000 / r)))
    val uniText = spread((1 to 60).map(r => (s"u$r", 17)))
    val docs = Seq(("zipf", zipfText), ("uni", uniText)).toDF("source", "text")
    val got = graft.text.CorpusStats.zipfProfile(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("zipf")._1 == 60L && got("uni")._1 == 60L)
    assert(math.abs(got("zipf")._3 + 1.0) < 0.05,
      s"power-law source must fit slope ~-1: ${got("zipf")}")
    assert(got("zipf")._2 < -0.99,
      "log-log fit must be near-perfectly linear on the plant")
    assert(got("uni")._3 > -0.1,
      s"uniform source must fit a near-flat slope: ${got("uni")}")
    // partitioning invariance (integer stats + pinned dag end to end)
    val again = graft.text.CorpusStats
      .zipfProfile(docs.repartition(5), "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(again == got)
  }

  test("df-score: document frequencies, mean df and hapax ratio by hand") {
    // df: apple→1, banana→2, cherry→1, solo→1
    val got = CorpusStats.dfScore(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((3L, 4L, 4.0 / 3.0, 2.0 / 3.0)),
      "doc 1: [apple, banana, apple] → sum_df 1+2+1, hapax 2 of 3")
    assert(got(2L) == ((2L, 3L, 1.5, 0.5)))
    assert(got(3L) == ((1L, 1L, 1.0, 1.0)), "a hapax-only doc scores ratio 1")
    assert(got(4L) == ((0L, 0L, 0.0, 0.0)), "zero-token docs survive with zeros")
  }

  test("guarded vocabulary join: the fallback strategy is result-identical") {
    val bcast = CorpusStats.dfScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fallback = CorpusStats.dfScore(docs, "doc_id", "text", maxBroadcastVocab = 0L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(bcast == fallback)
  }

  test("line clean: boilerplate and short lines drop, ratio is exact") {
    import spark.implicits._
    val d = Seq(
      (1L, "Click Here\nA real sentence that stays.\ntiny"),
      (2L, "HOME | About | Contact"), // boilerplate only → everything drops
      (3L, "")
    ).toDF("doc_id", "text")
    val cols = TextAnalysis.lineCleanColumns(col("text")).map { case (n, c) => c.as(n) }
    val got = d.select(col("doc_id") +: cols: _*)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getDouble(4)))).toMap
    val keptLen = "A real sentence that stays.".length.toDouble
    val totalLen = "Click Here\nA real sentence that stays.\ntiny".length.toDouble
    assert(got(1L) == ((3, 1, "A real sentence that stays.", keptLen / totalLen)))
    assert(got(2L) == ((1, 0, "", 0.0)), "case-insensitive boilerplate match")
    assert(got(3L)._4 == 0.0, "empty doc: ratio guards the 0/0")
  }

  test("BPE training: hand-traced merges, tiebreak, greedy non-overlap, exhaustion") {
    import spark.implicits._
    val J = graft.text.Bpe.Joiner
    // round 1: "a b" wins with count 3; round 2: all pairs tie at 1 and
    // "a·b a·b" is the lexicographically smallest — both the count rule
    // and the tiebreak are exercised
    val docs = Seq((0L, "a b a b c"), (1L, "a b x")).toDF("doc_id", "text")
    val (merges, state) = graft.text.Bpe.train(docs, "doc_id", "text", rounds = 2)
    assert(merges.map(m => (m.a, m.b, m.count)) ==
      Seq(("a", "b", 3L), (s"a${J}b", s"a${J}b", 1L)))
    val st = state.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st(0L) == s"a${J}b${J}a${J}b c")
    assert(st(1L) == s"a${J}b x")
    Caches.releaseAll()
    // greedy non-overlapping left-to-right: [a,a,a] under (a,a) → [aa, a]
    val runs = Seq((0L, "a a a")).toDF("doc_id", "text")
    val (m2, s2) = graft.text.Bpe.train(runs, "doc_id", "text", rounds = 1)
    assert(m2 == Seq(graft.text.Bpe.Merge("a", "a", 2L)))
    assert(s2.collect()(0).getString(1) == s"a${J}a a")
    Caches.releaseAll()
    // exhaustion: single-symbol docs have no adjacent pairs — training
    // stops early instead of emitting degenerate merges
    val singles = Seq((0L, "solo"), (1L, "alone")).toDF("doc_id", "text")
    val (m3, s3) = graft.text.Bpe.train(singles, "doc_id", "text", rounds = 3)
    assert(m3.isEmpty)
    assert(s3.collect().map(_.getString(1)).sorted.toSeq == Seq("alone", "solo"))
    Caches.releaseAll()
  }
}
