package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{KSlack, KsInT, Monitoring}

/** `ignored_tuples` parity: the reference counts tuples arriving behind
  * the event-time frontier per replica
  * (/root/reference/wf/window_replica.hpp:256-264) and surfaces them
  * through its stats records (`wf/stats_record.hpp`; exercised by
  * tests/miscellanea/test_tracing_*.cpp). The Spark analog is the
  * engine's pre-operator late-row filter plus the
  * `stateOperators(i).numRowsDroppedByWatermark` counter on every
  * progress event — this spec plants a known number of late rows and
  * asserts the counter totals exactly that, observed through
  * [[Monitoring.attach]].
  *
  * The operator under the stream is [[KSlack.reorderTtl]], closing the
  * loop on its scaladoc's watermark-filter loss path: rows the engine
  * drops never reach the operator, so its own `dropped` counter excludes
  * them — and the progress counter is exactly where that loss IS
  * accounted.
  */
class MonitoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("numRowsDroppedByWatermark totals the planted late rows (ignored_tuples parity)") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val S = 1_000_000L
    def row(user: Long, id: Long, seq: Long, tsUs: Long) =
      KsInT(user, id, seq, tsUs, tsUs, new java.sql.Timestamp(tsUs / 1000L))

    val droppedByWm = new java.util.concurrent.atomic.AtomicLong(0L)
    // the listener is session-global: filter to THIS query's progress
    // events, or any other suite's streaming query on the shared session
    // would inflate the exact-equality counter
    val listener = Monitoring.attach(spark) { e =>
      if (e.progress.name == "mon_kslack2")
        e.progress.stateOperators.foreach(op =>
          droppedByWm.addAndGet(op.numRowsDroppedByWatermark): Unit)
    }
    val mem = MemoryStream[KsInT]
    val q2 = KSlack.reorderTtl(
        mem.toDS().withWatermark("event_time", "0 seconds").as[KsInT],
        ttlUs = 3600L * S).toDF()
      .writeStream.format("memory").queryName("mon_kslack2")
      .outputMode("append").start()
    try {
      // batch 1: establish the watermark at 100 s (delay 0)
      mem.addData(row(1, 1, 1, 100 * S), row(1, 2, 2, 100 * S))
      q2.processAllAvailable()
      // batch 2: 7 rows at 50 s — behind the watermark, silently discarded
      // by the engine BEFORE the operator — plus one live row at 200 s
      mem.addData((1 to 7).map(i => row(1, 10L + i, 10L + i, 50 * S)) :+
        row(1, 99, 99, 200 * S): _*)
      q2.processAllAvailable()

      // the engine-side counter accounts all 7 (listener delivery is
      // async — poll); the operator's own dropped counter must NOT —
      // those rows never reached it (the scaladoc'd accounting gap)
      val deadline = System.currentTimeMillis() + 15000
      while (droppedByWm.get() < 7 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(droppedByWm.get() == 7,
        s"listener saw ${droppedByWm.get()} watermark-dropped rows, planted 7")
      // cross-check against the query's own synchronous progress log
      val fromProgress = q2.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(fromProgress == 7, s"recentProgress totals $fromProgress, planted 7")
      val out = spark.table("mon_kslack2").as[graft.streaming.KsOut].collect()
      assert(out.forall(_.dropped_so_far == 0L),
        "operator-level drop counter must exclude engine-side watermark drops")
      assert(!out.exists(o => o.ts_us == 50 * S),
        "a planted late row leaked through the engine filter")
    } finally {
      q2.stop()
      Monitoring.detach(spark, listener)
      spark.sql("DROP TABLE IF EXISTS mon_kslack2")
    }
  }

  test("per-operator runtime stats surface through progress events (stats_record parity)") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // the reference records, per operator replica, processing durations,
    // input/output counts and rates (/root/reference/wf/stats_record.hpp,
    // surfaced by tests/miscellanea/test_tracing_*.cpp); the Spark analog
    // is the progress event itself: per-trigger durationMs, row counts and
    // rates at query level, and per-STATE-OPERATOR rows/updates/state
    // bytes/commit times. This pins the mapping on a real stateful query
    // (the rolling reduce) so a listener-based dashboard has an asserted
    // contract, not a documented hope.
    val (listener, snapshot) = Monitoring.statsCollector(spark, "mon_stats")
    val mem = MemoryStream[graft.streaming.EvRow]
    val q = graft.streaming.StatefulOps.rollingReduce(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("mon_stats")
      .outputMode("update").start()
    try {
      // two data batches over 3 keys / 10 rows total, so rows-total vs
      // rows-updated diverge (state rows accumulate, updates are per-batch)
      mem.addData((1 to 6).map(i =>
        graft.streaming.EvRow(i.toLong, (i % 3).toLong, i * 1000L, i.toLong)): _*)
      q.processAllAvailable()
      mem.addData((7 to 10).map(i =>
        graft.streaming.EvRow(i.toLong, (i % 3).toLong, i * 1000L, i.toLong)): _*)
      q.processAllAvailable()

      // listener delivery is async — poll until both data batches arrived
      val deadline = System.currentTimeMillis() + 15000
      def data = snapshot().filter(_.numInputRows > 0)
      while (data.map(_.numInputRows).sum < 10 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(data.map(_.numInputRows).sum == 10,
        s"planted 10 rows, progress accounts ${data.map(_.numInputRows).sum}")
      data.foreach { p =>
        // per-trigger duration: the batch wall-clock the reference logs as
        // per-operator service time rolls up into triggerExecution
        assert(p.triggerExecutionMs >= 0L, s"trigger duration missing: $p")
        assert(p.processedRowsPerSecond > 0.0, s"no processing rate: $p")
        // exactly one state operator (the rolling-reduce fold)
        assert(p.operators.length == 1, s"expected 1 state operator: $p")
        val op = p.operators.head
        assert(op.operator.nonEmpty, "state operator must be named")
        assert(op.numRowsUpdated > 0, s"data batch updated no state rows: $op")
        assert(op.memoryUsedBytes > 0, s"state bytes not reported: $op")
        assert(op.commitTimeMs >= 0 && op.allUpdatesTimeMs >= 0,
          s"state timing counters missing: $op")
      }
      // state rows accumulate to the key cardinality (3 users), visible on
      // the LAST data batch — the reference's per-replica keymap size
      assert(data.last.operators.head.numRowsTotal == 3,
        s"state rows != key cardinality: ${data.last.operators.head}")
      // the collector is a faithful view: replaying the query's own
      // synchronous progress log through the same mapping gives the same
      // records (same batches, same counters)
      val replay = q.recentProgress.toIndexedSeq
        .filter(_.numInputRows > 0).map(Monitoring.toStats)
      assert(replay == data,
        s"collector diverged from recentProgress replay:\n$replay\nvs\n$data")
    } finally {
      q.stop()
      Monitoring.detach(spark, listener)
      spark.sql("DROP TABLE IF EXISTS mon_stats")
    }
  }
}
