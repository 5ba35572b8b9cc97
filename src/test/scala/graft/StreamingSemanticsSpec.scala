package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{AsofIn, EvRow, FfatIn, IjIn, KsIn, StatefulOps}

/** Watermark/lateness and state-backend semantics (SURVEY §2.8):
  *  - late rows beyond the watermark are dropped and *counted* — the
  *    reference's allowed-lateness + ignored_tuples behavior
  *    (/root/reference/wf/window_replica.hpp:256-264,305;
  *    withLateness wf/builders.hpp:773);
  *  - the RocksDB state store is a pure-config swap (the reference's
  *    whole P_* persistent-operator family, wf/persistent/).
  */
class StreamingSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("late rows beyond the watermark are dropped and counted (ignored_tuples)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = mem.toDF().toDF("id", "event_time")
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_x")
      .outputMode("update").start()
    def ts(min: Long) = new java.sql.Timestamp(3600_000L * 24 * 365 * 50 + min * 60_000L)
    mem.addData((1L, ts(0)), (2L, ts(60))) // watermark → t+50min
    q.processAllAvailable()
    mem.addData((3L, ts(10)))              // 40min older than watermark → dropped
    q.processAllAvailable()
    val dropped = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    q.stop()
    assert(dropped == 1, s"expected exactly the late row dropped, got $dropped")
    // and the dropped row contributed to no window
    val total = spark.table("late_x").agg(sum("n")).collect()(0).getLong(0)
    assert(total == 2)
  }

  test("watermarked streaming dedup evicts state (bounded, not ever-growing)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = mem.toDF().toDF("id", "event_time")
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("dedup_state_x")
      .outputMode("append").start()
    def ts(min: Long) = new java.sql.Timestamp(3600_000L * 24 * 365 * 50 + min * 60_000L)
    // batch 1: 3 distinct keys (+1 in-batch duplicate)
    mem.addData((1L, ts(0)), (1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
    q.processAllAvailable()
    val afterB1 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    // batch 2: advance event time far past the delay → watermark passes the
    // batch-1 keys' eviction timestamps; their state rows must go away
    mem.addData((100L, ts(600)))
    q.processAllAvailable()
    mem.addData((101L, ts(1200))) // one more advance so eviction is visible
    q.processAllAvailable()
    val afterB3 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    assert(afterB1 >= 3, s"expected ≥3 state rows after batch 1, got $afterB1")
    assert(afterB3 < afterB1,
      s"state must shrink once the watermark passes old keys ($afterB1 → $afterB3)")
    // and the duplicate never reached the sink
    val ids = spark.table("dedup_state_x").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 100L, 101L))
  }

  test("append-mode windows emit once on watermark pass and evict their state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = mem.toDF().toDF("id", "event_time")
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("append_win_x")
      .outputMode("append").start()
    def ts(min: Long) = new java.sql.Timestamp(3600_000L * 24 * 365 * 50 + min * 60_000L)
    try {
      // two windows' worth of data; watermark still behind both ends
      mem.addData((1L, ts(0)), (2L, ts(1)), (3L, ts(6)))
      q.processAllAvailable()
      val afterB1 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(afterB1 >= 2, s"expected both open windows in state, got $afterB1")
      assert(spark.table("append_win_x").count() == 0,
        "append mode must not emit a window before the watermark passes its end")
      // advance the watermark past both window ends → exactly-once emission
      mem.addData((4L, ts(60)))
      q.processAllAvailable()
      mem.addData((5L, ts(120))) // one more advance so eviction is visible
      q.processAllAvailable()
      val afterB3 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // three closed windows: [0,5)=2 rows, [5,10)=1, [60,65)=1; the
      // ts(120) window is still open and must NOT appear
      val rows = spark.table("append_win_x").select("n").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == Seq(1L, 1L, 2L),
        s"expected windows (2,1,1) emitted exactly once, got ${rows.toSeq}")
      assert(afterB3 < afterB1,
        s"closed windows must leave the state store ($afterB1 → $afterB3)")
    } finally q.stop()
  }

  test("monitoring listener observes progress with the reference's per-replica signals") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val seen = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val l = graft.streaming.Monitoring.attach(spark) { e =>
      seen.add(e.progress.numInputRows)
    }
    try {
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val q = mem.toDF().toDF("id", "event_time")
        .groupBy("id").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("mon_x")
        .outputMode("complete").start()
      def ts(min: Long) = new java.sql.Timestamp(3600_000L * 24 * 365 * 50 + min * 60_000L)
      mem.addData((1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
      q.processAllAvailable()
      q.stop()
      // listener events are delivered asynchronously after batch completion
      def hit = seen.toArray.exists(_ == 3L)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!hit && System.nanoTime() < deadline) Thread.sleep(50)
      assert(hit, s"progress events must report the batch's input rows, saw $seen")
    } finally graft.streaming.Monitoring.detach(spark, l)
  }

  test("RocksDB state store provider runs the same stateful operator (P_* family)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sq = s2.sqlContext
    val mem = MemoryStream[EvRow]
    val out = StatefulOps.rollingReduce(mem.toDS())(s2)
    val q = out.toDF().writeStream.format("memory").queryName("rocks_x")
      .outputMode("update").start()
    mem.addData(EvRow(1, 7, 1000, 150), EvRow(2, 7, 2000, 50))
    q.processAllAvailable()
    mem.addData(EvRow(3, 7, 3000, 100)) // state must survive into batch 2
    q.processAllAvailable()
    q.stop()
    val rows = s2.table("rocks_x").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 1.5, 1L), (2L, 2.0, 2L), (3L, 3.0, 3L)))

    // the pane-partial FlatFAT state (five parallel Long arrays) must
    // round-trip RocksDB serialization across batches the same way
    val mem2 = MemoryStream[FfatIn]
    val q2 = StatefulOps.slidingWindowsFfat(mem2.toDS(), 10000000L, 5000000L)(s2)
      .toDF().writeStream.format("memory").queryName("rocks_ffat_x")
      .outputMode("update").start()
    val t0 = 1600000000000000L
    mem2.addData(FfatIn("a", t0, 3L))
    q2.processAllAvailable()
    mem2.addData(FfatIn("a", t0 + 1000000L, 4L)) // folds into the restored pane
    q2.processAllAvailable()
    q2.stop()
    val win = s2.table("rocks_ffat_x")
      .filter(col("win_start_us") === (t0 - 5000000L))
      .orderBy(col("cnt").desc).collect().head
    assert((win.getLong(2), win.getLong(3), win.getLong(4), win.getLong(5)) ==
      ((2L, 7L, 3L, 4L)), win.toString)
  }

  test("multi-input watermark is the minimum across sources (Watermark_Collector)") {
    // the reference merges watermarks with min across input channels
    // (wf/watermark_collector.hpp:24-34); Spark's union must do the same:
    // the slow source holds the merged watermark back
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val fast = MemoryStream[(Long, java.sql.Timestamp)]
    val slow = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(min: Long) = new java.sql.Timestamp(3600_000L * 24 * 365 * 50 + min * 60_000L)
    // watermark each input channel, then merge: Spark's default
    // multipleWatermarkPolicy=min takes the minimum across the two
    // watermark nodes — exactly the reference's per-channel min-merge
    val agg = fast.toDF().toDF("id", "event_time")
      .withWatermark("event_time", "0 seconds")
      .union(slow.toDF().toDF("id", "event_time")
        .withWatermark("event_time", "0 seconds"))
      .groupBy(window(col("event_time"), "5 minutes")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_merge_x")
      .outputMode("append").start()
    fast.addData((1L, ts(600))) // fast source far ahead
    slow.addData((2L, ts(10)))  // slow source holds the line
    q.processAllAvailable()
    fast.addData((3L, ts(601)))
    q.processAllAvailable()
    val wm = q.lastProgress.eventTime.get("watermark")
    q.stop()
    // merged watermark must track the SLOW source (minute 10), not the fast
    // one (minute 600) — i.e. strictly before ts(600)
    assert(wm != null && java.sql.Timestamp.valueOf(wm.replace("T", " ").replace("Z", ""))
      .before(ts(600)), s"merged watermark $wm must be held back by the slow source")
  }

  test("RocksDB state store runs count windows too (P_Keyed_Windows family)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sq = s2.sqlContext
    val mem = MemoryStream[EvRow]
    val out = StatefulOps.countTumblingWindows(mem.toDS(), len = 3L)(s2)
    val q = out.toDF().writeStream.format("memory").queryName("rocks_cw_x")
      .outputMode("update").start()
    mem.addData((1L to 4L).map(i => EvRow(i, 7, i * 1000, 100)): _*)
    q.processAllAvailable()
    mem.addData(EvRow(5, 7, 5000, 100), EvRow(6, 7, 6000, 100)) // closes window 1
    q.processAllAvailable()
    q.stop()
    // latest state per (user, wid): window 0 = events 1-3, window 1 = 4-6
    val rows = s2.table("rocks_cw_x").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(4), r.getLong(5))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
    assert(rows == Map((7L, 0L) -> ((3L, 1L, 3L)), (7L, 1L) -> ((3L, 4L, 6L))),
      s"got $rows")
  }

  test("RocksDB round-trips the List/case-class states of interval, as-of and KSlack ops") {
    // r6 proved pane-partial arrays and count windows serialize through
    // RocksDBStateStoreProvider; this extends the same evidence standard
    // to the remaining state shapes — IjState/AsofState (Lists of case
    // classes) and KsState (adaptive-K scalars + sorted buffer) — by
    // running each operator CROSS-BATCH (state must restore from the
    // provider, not the JVM) under both providers and asserting identical
    // output, plus the hand-expected rows.
    var n = 0
    def session(rocks: Boolean) = {
      val s2 = spark.newSession()
      if (rocks) s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      n += 1
      (s2, s"rocks_rt_$n")
    }

    // interval join: both sides buffer across batches; the b3 left must
    // match rights restored from batches 1 and 2
    def runInterval(rocks: Boolean): Seq[(Long, Long, Double)] = {
      val (s2, name) = session(rocks)
      import s2.implicits._
      implicit val sq = s2.sqlContext
      val mem = MemoryStream[IjIn]
      val q = StatefulOps.intervalJoinShared(mem.toDS(), boundUs = 30_000_000L)(s2)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      mem.addData(IjIn(1, 7, 10_000_000L, 1.0, isLeft = true),
        IjIn(2, 7, 50_000_000L, 5.0, isLeft = false)) // |10-50| > 30 s: buffered
      q.processAllAvailable()
      mem.addData(IjIn(3, 7, 30_000_000L, 3.0, isLeft = false)) // pairs with L1
      q.processAllAvailable()
      mem.addData(IjIn(4, 7, 55_000_000L, 4.0, isLeft = true)) // pairs with R2, R3
      q.processAllAvailable()
      q.stop()
      val rows = s2.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq.sorted
      s2.sql(s"DROP TABLE IF EXISTS $name")
      rows
    }
    val wantIj = Seq((1L, 3L, 4.0), (4L, 2L, 9.0), (4L, 3L, 7.0))
    assert(runInterval(rocks = false) == wantIj)
    assert(runInterval(rocks = true) == wantIj, "IjState diverged under RocksDB")

    // as-of join: pending lefts and the collapsed right carry must restore
    // across batches; the b3 left is answered from the CARRY (r2@4s)
    def runAsof(rocks: Boolean): Seq[(Long, Option[Long], Option[Double])] = {
      val (s2, name) = session(rocks)
      import s2.implicits._
      implicit val sq = s2.sqlContext
      def in(id: Long, user: Long, ms: Long, v: Double, left: Boolean) =
        AsofIn(id, user, ms * 1000L, v, left, new java.sql.Timestamp(ms))
      val mem = MemoryStream[AsofIn]
      val q = StatefulOps.asofJoinShared(
        mem.toDS().withWatermark("event_time", "10 seconds"))(s2)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      mem.addData(in(10, 1, 1000, 1.0, left = false), in(20, 1, 5000, 99.0, left = true))
      q.processAllAvailable() // nothing final yet (wm < 5 s)
      // late-but-better right + a far-future key-2 row: wm jumps, L20 emits
      // with r11@4s; rights ≤ wm collapse to the carry
      mem.addData(in(11, 1, 4000, 2.0, left = false), in(30, 2, 100000000, 0.0, left = false))
      q.processAllAvailable()
      // a fresh left far above the old rights must be answered from the
      // restored carry; another far-future row flushes it
      mem.addData(in(21, 1, 99999000, 7.0, left = true))
      q.processAllAvailable()
      mem.addData(in(31, 2, 200000000, 0.0, left = false))
      q.processAllAvailable()
      q.stop()
      val rows = s2.table(name).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq.sortBy(_._1)
      s2.sql(s"DROP TABLE IF EXISTS $name")
      rows
    }
    val wantAsof = Seq((20L, Some(4_000_000L), Some(2.0)),
      (21L, Some(4_000_000L), Some(2.0)))
    assert(runAsof(rocks = false) == wantAsof)
    assert(runAsof(rocks = true) == wantAsof, "AsofState diverged under RocksDB")

    // KSlack: the ts-sorted buffer, adaptive K and drop counter must
    // restore across batches (the existing hand-traced cross-batch drain)
    def runKslack(rocks: Boolean): Seq[(Long, Long)] = {
      val (s2, name) = session(rocks)
      import s2.implicits._
      implicit val sq = s2.sqlContext
      implicit val sp = s2
      val mem = MemoryStream[KsIn]
      val q = graft.streaming.KSlack.reorder(mem.toDS(), flushAtBatchEnd = false)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      mem.addData(KsIn(1, 1, 1, 10L, 0L), KsIn(1, 2, 2, 5L, 0L))
      q.processAllAvailable()
      mem.addData(KsIn(1, 3, 3, 100L, 0L)) // K=95; 5 released behind last → drop
      q.processAllAvailable()
      mem.addData(KsIn(1, 4, 4, 1000L, 0L)) // releases 100 with 1 drop carried
      q.processAllAvailable()
      q.stop()
      val rows = s2.table(name).collect()
        .map(r => (r.getLong(2), r.getLong(4))).toSeq.sortBy(_._1)
      s2.sql(s"DROP TABLE IF EXISTS $name")
      rows
    }
    val wantKs = Seq((10L, 0L), (100L, 1L))
    assert(runKslack(rocks = false) == wantKs)
    assert(runKslack(rocks = true) == wantKs, "KsState diverged under RocksDB")
  }

  test("lift/comb aggregator equals direct aggregation (Ffat_Windows equivalence)") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.SF)
      .selectExpr("user_id", "CAST(round(value * 100) AS BIGINT) AS cents")
      .as[(Long, Long)]
    val agg = graft.operators.LiftCombAggregator.sumCountMinMax
    val viaLiftComb = ev.groupByKey(_._1).mapValues(_._2).agg(agg.toColumn)
      .collect().toMap
    val direct = ev.toDF("user_id", "cents").groupBy("user_id")
      .agg(sum("cents"), count(lit(1)), min("cents"), max("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(viaLiftComb == direct)
  }
}
