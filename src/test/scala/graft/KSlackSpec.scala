package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{KSlack, KsIn}

/** PROBABILISTIC execution mode (KSlack reorder buffer,
  * /root/reference/wf/kslack_collector.hpp): out-of-order input within the
  * adapted K comes out in timestamp order; disorder beyond K drops (and
  * counts) tuples instead of stalling. The first test walks the reference
  * algorithm's exact state machine on a hand-traced sequence.
  */
class KSlackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(data: Seq[KsIn], flush: Boolean, batches: Seq[Seq[KsIn]] = Nil) = {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[KsIn]
    val q = KSlack.reorder(mem.toDS(), flushAtBatchEnd = flush).toDF()
      .writeStream.format("memory").queryName("kslack_x").outputMode("append").start()
    (if (batches.nonEmpty) batches else Seq(data)).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table("kslack_x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSeq // (user_id, event_id, ts_us, dropped_so_far) in sink-append order
    spark.sql("DROP TABLE IF EXISTS kslack_x")
    rows
  }

  /** Per-key emission sequences: the cross-key interleaving in the memory
    * sink is scheduler-dependent, but each key's own order is the operator's
    * emission order — the invariant the reference guarantees.
    */
  private def byKey(rows: Seq[(Long, Long, Long, Long)]): Map[Long, Seq[(Long, Long, Long)]] =
    rows.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap

  test("hand-traced adaptive-K sequence: reorder, drops, EOS flush") {
    // arrival ts: 10,5,20,15,30,8,40 (one key).
    //  ts=10 → tcurr=10, K=0, emit 10
    //  ts=5  → buffered (no new max)
    //  ts=20 → tcurr=20, delays{15,0} → K=15; release ≤5: 5 < last(10) → DROP
    //  ts=15 → buffered
    //  ts=30 → tcurr=30, delays{15,0} → K stays 15; release ≤15: emit 15
    //  ts=8  → buffered
    //  ts=40 → tcurr=40, delays{32,0} → K=32; release ≤8: 8 < last(15) → DROP
    //  EOS flush: emit 20, 30, 40
    val in = Seq(10L, 5L, 20L, 15L, 30L, 8L, 40L).zipWithIndex.map {
      case (ts, i) => KsIn(user_id = 1L, event_id = i + 1L, seq = i + 1L, ts_us = ts, cents = ts)
    }
    val out = run(in, flush = true)
    assert(out.map(_._3) == Seq(10L, 15L, 20L, 30L, 40L), s"emitted ts: $out")
    assert(out.map(_._4) == Seq(0L, 1L, 2L, 2L, 2L), s"dropped counters: $out")
  }

  test("in-order input passes through unchanged with K=0 and no drops") {
    val in = (1L to 50L).map(i => KsIn(1L, i, i, i * 100L, i))
    val out = run(in, flush = true)
    assert(out.map(_._2) == (1L to 50L).toSeq)
    assert(out.forall(_._4 == 0L))
  }

  test("KSlack output is invariant under random micro-batch splits (seeded)") {
    // the release logic is per-tuple in seq order; batch boundaries that
    // respect arrival order must not change what is emitted or dropped
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i =>
      KsIn(1L + (i % 3), i, i, i * 10 + rnd.nextInt(50), i))
    val reference = run(rows, flush = false)
    (1 to 3).foreach { k =>
      val nCuts = 1 + rnd.nextInt(5)
      val cuts = (Seq(0, rows.size) ++ Seq.fill(nCuts)(rnd.nextInt(rows.size)))
        .distinct.sorted
      val chunks = cuts.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }.toSeq
      val got = run(Nil, flush = false, batches = chunks)
      assert(byKey(got) == byKey(reference), s"chunking $k (${chunks.map(_.size)}) diverged")
    }
  }

  test("state persists across micro-batches; later batch drains earlier buffer") {
    // batch 1 ends with ts=5 buffered (no flush); batch 2's ts=100 adapts K
    // and releases it — within-K disorder survives a batch boundary.
    val b1 = Seq(KsIn(1L, 1L, 1L, 10L, 0L), KsIn(1L, 2L, 2L, 5L, 0L))
    val b2 = Seq(KsIn(1L, 3L, 3L, 100L, 0L))
    val out = run(Nil, flush = false, batches = Seq(b1, b2))
    // ts=10 emits in batch 1; ts=100 → K=95, release ≤5: 5 < last(10) → drop;
    // 100 stays buffered (no flush) — so emitted = [10], dropped=1 recorded
    // on no later emission; verify by a third draining batch
    val out2 = run(Nil, flush = false,
      batches = Seq(b1, b2, Seq(KsIn(1L, 4L, 4L, 1000L, 0L))))
    assert(out.map(_._3) == Seq(10L))
    assert(out2.map(_._3) == Seq(10L, 100L), s"got $out2")
    assert(out2.last._4 == 1L, s"expected 1 drop carried in state, got $out2")
  }
}
