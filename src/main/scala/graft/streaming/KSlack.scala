package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** KSlack input: `seq` is the per-key arrival order (the stream position in
  * the reference's single-replica collector); `ts_us` the event time.
  */
case class KsIn(user_id: Long, event_id: Long, seq: Long, ts_us: Long, cents: Long)

/** [[KsIn]] + the watermarked event-time column, for the TTL flavor
  * ([[KSlack.reorderTtl]]): `EventTimeTimeout` requires the watermark
  * attribute to reach the stateful operator.
  */
case class KsInT(user_id: Long, event_id: Long, seq: Long, ts_us: Long, cents: Long,
    event_time: java.sql.Timestamp)

/** Reorder-buffer entry + per-key state: adaptive K, highest ts seen
  * (tcurr), last emitted ts (order guard), drop counter, the ts-sorted
  * buffer, and the delays sampled since the last K update.
  */
case class KsBufEntry(ts_us: Long, event_id: Long, cents: Long)
case class KsState(k: Long, tcurr: Long, lastEmitted: Long, dropped: Long,
    buf: List[KsBufEntry], pendingTs: List[Long])

case class KsOut(user_id: Long, event_id: Long, ts_us: Long, cents: Long,
    dropped_so_far: Long)

/** The reference's PROBABILISTIC execution mode: a KSlack reorder buffer
  * (/root/reference/wf/kslack_collector.hpp:24-35, insertInput/extractInput
  * at :102-153). Out-of-order inputs are buffered in ts order; K adapts to
  * the maximum delay observed so far (sampled between successive max-ts
  * advances); whenever a new maximum timestamp tcurr arrives, buffered
  * inputs with ts ≤ tcurr − K are released in order. An input that would
  * be released behind the last emitted timestamp is dropped and counted —
  * the probabilistic part of the contract (disorder beyond the adapted K
  * loses tuples instead of stalling the stream).
  *
  * Scale: state is per-key and O(buffered disorder window), exactly the
  * reference's per-replica deque — with the RocksDB provider it spills.
  * The in-batch buffer is an ordered mutable map, so each arrival costs
  * O(log buffer) instead of the O(buffer) list splice of rounds 2–6 —
  * under a large adapted K the per-key batch cost is O(n log n), not
  * O(n²). Within each micro-batch, arrival order is the caller-supplied
  * `seq` (deterministic across partitionings, like the DETERMINISTIC-mode
  * batch sort in [[StatefulOps]]).
  */
object KSlack {

  /** The per-key machine, shared by both flavors: folds one batch's
    * arrivals (already seq-sorted) into the state, returning the released
    * rows. The buffer is ordered by (ts, event_id); `flush` drains it at
    * the end (in order, same drop rule) — the EOS analog.
    *
    * Cost note: the TreeMap is rebuilt from the serialized buffer List at
    * the START of every micro-batch a key receives data — O(buffer ·
    * log buffer) per (key, batch) on top of the per-arrival O(log
    * buffer). That is the price of `flatMapGroupsWithState`'s
    * serialize-per-batch state contract; it is bounded (the buffer holds
    * only the disorder window) and beats the alternative of keeping the
    * state AS a sorted list, which made each arrival an O(buffer) splice
    * (rounds 2–6: measured 8.9 s → 14 ms on a 30k-arrival batch).
    */
  private def processBatch(user: Long, st: KsState, rows: Seq[KsIn],
      flush: Boolean): (KsState, Seq[KsOut]) = {
    var k = st.k
    var tcurr = st.tcurr
    var last = st.lastEmitted
    var dropped = st.dropped
    var pending = st.pendingTs
    // values are LISTS so duplicate (ts, event_id) arrivals (at-least-once
    // upstream replays) keep their multiplicity, exactly like the
    // reference's deque — a plain map value would silently collapse them
    val buf = scala.collection.mutable.TreeMap.empty[(Long, Long), List[Long]]
    def insert(ts: Long, id: Long, cents: Long): Unit =
      buf.updateWith((ts, id)) {
        case Some(cs) => Some(cs :+ cents)
        case None => Some(cents :: Nil)
      }
    st.buf.foreach(e => insert(e.ts_us, e.event_id, e.cents))
    val out = scala.collection.mutable.ListBuffer[KsOut]()
    def release(bound: Long): Unit =
      while (buf.nonEmpty && buf.firstKey._1 <= bound) {
        val ((ts, id), centsList) = buf.head
        buf.remove(buf.firstKey)
        centsList.foreach { cents =>
          if (ts < last) dropped += 1 // behind an already-emitted ts
          else {
            last = ts
            out += KsOut(user, id, ts, cents, dropped)
          }
        }
      }
    rows.foreach { t =>
      insert(t.ts_us, t.event_id, t.cents)
      pending ::= t.ts_us
      if (t.ts_us > tcurr) { // new max ts: adapt K, release the front
        tcurr = t.ts_us
        val maxD = pending.iterator.map(tcurr - _).max
        if (maxD > k) k = maxD
        pending = Nil
        release(tcurr - k)
      }
    }
    if (flush) release(Long.MaxValue)
    val bufList = buf.iterator.flatMap { case ((ts, id), cs) =>
      cs.map(KsBufEntry(ts, id, _)) }.toList
    (KsState(k, tcurr, last, dropped, bufList, pending), out.toSeq)
  }

  /** `flushAtBatchEnd` drains the buffer (in order, same drop rule) after
    * each micro-batch — the EOS flush analog, for bounded single-batch
    * (Trigger.AvailableNow) runs. Continuous deployments pass false and
    * let K-release pace the output (or use [[reorderTtl]]).
    */
  def reorder(ev: Dataset[KsIn], flushAtBatchEnd: Boolean)(
      implicit spark: SparkSession): Dataset[KsOut] = {
    import spark.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[KsIn], state: GroupState[KsState]) =>
          val st = state.getOption.getOrElse(KsState(0L, 0L, 0L, 0L, Nil, Nil))
          val (next, out) =
            processBatch(user, st, it.toSeq.sortBy(e => (e.seq, e.event_id)),
              flushAtBatchEnd)
          state.update(next)
          out.iterator
      }
  }

  /** [[reorder]] + an idle-key drain: a key that receives no arrivals
    * while the watermark advances `ttlUs` past its last activity has its
    * buffer DRAINED in order (same drop rule as [[reorder]]'s flush on
    * the drained buffer — rows behind the last emitted ts are dropped and
    * counted) and its whole state row evicted; a later re-activation
    * restarts the K adaptation and counters from zero (the
    * rollingReduceTtl restart trade). "Idle" is measured relative to
    * ACTIVITY, not to the key's max seen ts: every batch that delivers
    * rows re-arms the timer at max(tcurr + ttl, watermark + ttl), so a
    * key that stays active with monotonically non-increasing timestamps
    * (tcurr frozen while the global watermark advances) is NOT drained
    * mid-activity — it drains only once it truly stops receiving for a
    * ttl of watermark time.
    *
    * WATERMARK-FILTER LOSS PATH (caller contract): because the input is
    * watermarked, the ENGINE's pre-operator late-row filter silently
    * discards any arrival whose `event_time` is already behind the
    * current watermark — those rows never reach this operator, so they
    * are neither emitted nor counted in `dropped` (the reference
    * collector accounts for every tuple; the bounded [[reorder]], whose
    * input needs no watermark, still does). Deployments MUST set the
    * watermark delay at least as large as the disorder bound they expect
    * K to adapt to — otherwise disorder beyond the delay vanishes without
    * trace in the operator's own counter. The engine-side loss IS
    * observable: each progress event's
    * `stateOperators(i).numRowsDroppedByWatermark` counts exactly these
    * pre-operator drops ([[Monitoring.attach]]; parity with the
    * reference's `ignored_tuples` asserted in MonitoringSpec).
    *
    * DIVERGENCE FROM THE REFERENCE (deliberate): the reference's collector
    * releases only on new-max arrivals or EOS
    * (/root/reference/wf/kslack_collector.hpp:102-153) — a key that stops
    * sending holds its buffer and samples forever. That is parity-correct
    * for the bounded [[reorder]], but in a continuous deployment it is an
    * unbounded-idle-state leak; this flavor is the Spark-native upgrade
    * (same shape as [[StatefulOps.rollingReduceTtl]]). Input must carry a
    * watermarked `event_time`.
    */
  def reorderTtl(ev: Dataset[KsInT], ttlUs: Long)(
      implicit spark: SparkSession): Dataset[KsOut] = {
    import spark.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[KsInT], state: GroupState[KsState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val (_, out) = processBatch(user, st, Nil, flush = true)
            // the drained key's whole state row is EVICTED (the point of
            // the TTL flavor — keeping even the empty scalar row would
            // leak one row per key ever seen); a re-activating key
            // restarts its K adaptation and drop counter from zero, the
            // same restart trade as rollingReduceTtl
            state.remove()
            out.iterator
          } else {
            val st = state.getOption.getOrElse(KsState(0L, 0L, 0L, 0L, Nil, Nil))
            val (next, out) = processBatch(user, st,
              it.map(t => KsIn(t.user_id, t.event_id, t.seq, t.ts_us, t.cents))
                .toSeq.sortBy(e => (e.seq, e.event_id)),
              flush = false)
            state.update(next)
            val wmMs = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
            // arm relative to ACTIVITY: this branch only runs on batches
            // that delivered rows, so wm + ttl keeps an active key's timer
            // ahead of the watermark even when tcurr is frozen
            // (non-increasing timestamps); tcurr + ttl dominates while the
            // watermark still trails the key's own event time. The +1
            // floor keeps the timer strictly above the watermark when
            // ttlUs < 1 ms.
            state.setTimeoutTimestamp(math.max(
              math.max((next.tcurr + ttlUs) / 1000L, wmMs + ttlUs / 1000L),
              wmMs + 1L))
            out.iterator
          }
      }
  }
}
