package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** KSlack input: `seq` is the per-key arrival order (the stream position in
  * the reference's single-replica collector); `ts_us` the event time.
  */
case class KsIn(user_id: Long, event_id: Long, seq: Long, ts_us: Long, cents: Long)

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
  * Within each micro-batch, arrival order is the caller-supplied `seq`
  * (deterministic across partitionings, like the DETERMINISTIC-mode batch
  * sort in [[StatefulOps]]).
  */
object KSlack {

  /** `flushAtBatchEnd` drains the buffer (in order, same drop rule) after
    * each micro-batch — the EOS flush analog, for bounded single-batch
    * (Trigger.AvailableNow) runs. Continuous deployments pass false and
    * let K-release pace the output.
    */
  def reorder(ev: Dataset[KsIn], flushAtBatchEnd: Boolean)(
      implicit spark: SparkSession): Dataset[KsOut] = {
    import spark.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[KsIn], state: org.apache.spark.sql.streaming.GroupState[KsState]) =>
          val st = state.getOption.getOrElse(KsState(0L, 0L, 0L, 0L, Nil, Nil))
          var k = st.k
          var tcurr = st.tcurr
          var last = st.lastEmitted
          var dropped = st.dropped
          var buf = st.buf
          var pending = st.pendingTs
          val out = scala.collection.mutable.ListBuffer[KsOut]()
          def release(bound: Long): Unit =
            while (buf.nonEmpty && buf.head.ts_us <= bound) {
              val e = buf.head
              buf = buf.tail
              if (e.ts_us < last) dropped += 1 // behind an already-emitted ts
              else {
                last = e.ts_us
                out += KsOut(user, e.event_id, e.ts_us, e.cents, dropped)
              }
            }
          it.toSeq.sortBy(e => (e.seq, e.event_id)).foreach { t =>
            val entry = KsBufEntry(t.ts_us, t.event_id, t.cents)
            val (before, after) = buf.span(b =>
              b.ts_us < entry.ts_us || (b.ts_us == entry.ts_us && b.event_id < entry.event_id))
            buf = before ::: entry :: after
            pending ::= t.ts_us
            if (t.ts_us > tcurr) { // new max ts: adapt K, release the front
              tcurr = t.ts_us
              val maxD = pending.iterator.map(tcurr - _).max
              if (maxD > k) k = maxD
              pending = Nil
              release(tcurr - k)
            }
          }
          if (flushAtBatchEnd) release(Long.MaxValue)
          state.update(KsState(k, tcurr, last, dropped, buf, pending))
          out.iterator
      }
  }
}
