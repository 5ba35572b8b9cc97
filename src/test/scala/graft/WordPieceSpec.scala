package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Bpe, WordPiece}

/** WordPiece-objective training: the likelihood rule beating raw
  * frequency (the defining divergence from BPE), the exact-integer score
  * grid with its pair-ascending tiebreak, the min-frequency floor, and
  * early exhaustion when no pair clears the floor.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val J = Bpe.Joiner

  test("likelihood argmax diverges from frequency argmax; round 2 sees merged symbols") {
    // (of,the) count 6 but of/the each occur 6 times → scoreq
    // 6e15 div 36 = 166_666_666_666_666; (qq,zz) count 2 with parts
    // occurring ONLY together → 2e15 div 4 = 500_000_000_000_000.
    // WordPiece merges the cohesive rare pair; BPE the frequent one.
    val docs = Seq(
      (0L, "of the of the of the"),
      (1L, "of the of the of the"),
      (2L, "qq zz"),
      (3L, "qq zz")).toDF("doc_id", "text")
    val (wp, state) = WordPiece.train(docs, "doc_id", "text",
      rounds = 2, minCount = 1)
    // round 2: qq·zz has no neighbors left; (of,the) 6e15/36 beats
    // (the,of) 4e15/36 — merged-state counts feed the next round
    assert(wp.map(m => (m.a, m.b, m.count)) ==
      Seq(("qq", "zz", 2L), ("of", "the", 6L)))
    val st = state.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st(2L) == s"qq${J}zz")
    assert(st(0L) == s"of${J}the of${J}the of${J}the")
    Caches.releaseAll()
    val (bpe, _) = Bpe.train(docs, "doc_id", "text", rounds = 1)
    assert(bpe.head.a == "of" && bpe.head.b == "the" && bpe.head.count == 6L,
      "BPE's frequency rule must pick the other pair — the families differ")
    Caches.releaseAll()
  }

  test("min-frequency floor excludes low-support pairs (the default knob)") {
    val docs = Seq(
      (0L, "of the of the of the"),
      (1L, "of the of the of the"),
      (2L, "qq zz"),
      (3L, "qq zz")).toDF("doc_id", "text")
    // floor 5: (qq,zz) count 2 and (the,of) count 4 are out; the only
    // qualifying pair is (of,the) count 6
    val (wp, _) = WordPiece.train(docs, "doc_id", "text",
      rounds = 1, minCount = 5)
    assert(wp.map(m => (m.a, m.b, m.count)) == Seq(("of", "the", 6L)))
    Caches.releaseAll()
  }

  test("equal quantized scores break by pair string ascending") {
    val docs = Seq(
      (0L, "cc dd"), (1L, "cc dd"),
      (2L, "aa bb"), (3L, "aa bb")).toDF("doc_id", "text")
    // both pairs: 2e15 div 4 — an exact tie on the integer grid
    val (wp, _) = WordPiece.train(docs, "doc_id", "text",
      rounds = 1, minCount = 2)
    assert(wp.map(m => (m.a, m.b)) == Seq(("aa", "bb")))
    Caches.releaseAll()
  }

  test("training stops early when no pair clears the floor") {
    val docs = Seq((0L, "x y"), (1L, "p q")).toDF("doc_id", "text")
    val (wp, state) = WordPiece.train(docs, "doc_id", "text",
      rounds = 3, minCount = 5)
    assert(wp.isEmpty)
    assert(state.collect().map(_.getString(1)).sorted.toSeq ==
      Seq("p q", "x y"), "state stays untouched")
    Caches.releaseAll()
  }

  test("batched training with batch = 1 degenerates to the single-merge trainer") {
    val docs = Seq(
      (0L, "of the of the of the"),
      (1L, "of the of the of the"),
      (2L, "qq zz"),
      (3L, "qq zz")).toDF("doc_id", "text")
    val (single, s1) = WordPiece.train(docs, "doc_id", "text",
      rounds = 3, minCount = 1)
    Caches.releaseAll()
    val (batched, s2) = WordPiece.trainBatched(docs, "doc_id", "text",
      batchRounds = 3, batch = 1, minCount = 1)
    assert(batched == single,
      "batch = 1 must reproduce the argmax trainer merge for merge")
    assert(s2.orderBy("doc_id").collect().map(_.getString(1)).toSeq ==
      s1.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
    Caches.releaseAll()
  }

  test("a batch takes symbol-DISJOINT merges in rank order; conflicts defer to the next round") {
    // scores (cnt·1e15 div ca·cb):
    //   "mm nn" ×2 → (mm,nn): 2e15/(2·2) = 5e14 (rank 1)
    //   "qq rr" ×2 → (qq,rr): 2e15/(4·2) = 2.5e14 (qq occurs 4×)
    //   "qq zz" ×2 → (qq,zz): 2e15/(4·2) = 2.5e14
    // the 2.5e14 tie breaks pair-ascending: (qq,rr) ranks 2, (qq,zz)
    // ranks 3 and SHARES qq with the higher-ranked candidate → skipped
    // in this batch even though the batch has room
    val docs = Seq(
      (0L, "qq zz"), (1L, "qq zz"),
      (2L, "qq rr"), (3L, "qq rr"),
      (4L, "mm nn"), (5L, "mm nn")).toDF("doc_id", "text")
    val (batched, state) = WordPiece.trainBatched(docs, "doc_id", "text",
      batchRounds = 1, batch = 3, minCount = 1)
    assert(batched.map(m => (m.a, m.b)) == Seq(("mm", "nn"), ("qq", "rr")),
      s"conflicting (qq,zz) must be deferred: $batched")
    val st = state.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st(4L) == s"mm${J}nn" && st(2L) == s"qq${J}rr" &&
      st(0L) == "qq zz", "only the selected merges rewrite")
    Caches.releaseAll()
    // a second round picks the deferred pair — nothing is lost, only
    // deferred (the standard batching contract)
    val (two, _) = WordPiece.trainBatched(docs, "doc_id", "text",
      batchRounds = 2, batch = 3, minCount = 1)
    assert(two.map(m => (m.a, m.b)) ==
      Seq(("mm", "nn"), ("qq", "rr"), ("qq", "zz")), s"got $two")
    Caches.releaseAll()
  }
}
