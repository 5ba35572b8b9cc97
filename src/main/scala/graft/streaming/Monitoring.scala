package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Runtime monitoring — the reference's dashboard/stats surface
  * (/root/reference/wf/monitoring.hpp:28-34, wf/stats_record.hpp) maps to
  * `StreamingQueryListener` + the Spark UI. Progress events carry the
  * same signals the reference records per replica: rows/sec, batch
  * durations, state size, and watermark-dropped rows (≡ the
  * `ignored_tuples` counter, wf/window_replica.hpp:256-264).
  */
/** One state operator's counters for one trigger — the typed analog of a
  * reference stats record (`wf/stats_record.hpp` fields: service times,
  * input/output counts, per-replica state size, dropped tuples).
  */
case class OperatorStats(query: String, batchId: Long, operator: String,
    numRowsTotal: Long, numRowsUpdated: Long, numRowsRemoved: Long,
    numRowsDroppedByWatermark: Long, memoryUsedBytes: Long,
    allUpdatesTimeMs: Long, allRemovalsTimeMs: Long, commitTimeMs: Long)

/** One trigger's query-level record: rows, rates, wall-clock, plus the
  * per-operator breakdown. */
case class QueryStats(query: String, batchId: Long, numInputRows: Long,
    processedRowsPerSecond: Double, triggerExecutionMs: Long,
    operators: Seq[OperatorStats])

object Monitoring {

  def attach(spark: SparkSession)(
      onProgress: StreamingQueryListener.QueryProgressEvent => Unit): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = onProgress(e)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: StreamingQueryListener): Unit =
    spark.streams.removeListener(l)

  /** Progress event → typed records (the dashboard row the reference's
    * monitoring thread renders per replica, wf/monitoring.hpp:28-34).
    * Pure mapping — usable from any listener, a `recentProgress` replay,
    * or [[statsCollector]].
    */
  def toStats(p: org.apache.spark.sql.streaming.StreamingQueryProgress): QueryStats =
    QueryStats(p.name, p.batchId, p.numInputRows,
      // rates are NaN/absent on zero-duration or no-data triggers
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L),
      p.stateOperators.toIndexedSeq.map(op => OperatorStats(p.name, p.batchId,
        op.operatorName, op.numRowsTotal, op.numRowsUpdated, op.numRowsRemoved,
        op.numRowsDroppedByWatermark, op.memoryUsedBytes,
        op.allUpdatesTimeMs, op.allRemovalsTimeMs, op.commitTimeMs)))

  /** Attach a collector for `queryName`: returns the listener (detach it
    * when done) and a thread-safe snapshot accessor of every trigger's
    * [[QueryStats]] so far, in arrival order. Listener delivery is async —
    * callers polling right after `processAllAvailable` must wait for the
    * expected batch to appear (the same contract as `recentProgress`).
    * Driver-side memory is one small record per trigger per operator; a
    * long-running deployment should drain snapshots periodically or ship
    * each record out in `onProgress` instead of accumulating.
    */
  def statsCollector(spark: SparkSession, queryName: String)
      : (StreamingQueryListener, () => Seq[QueryStats]) = {
    val buf = scala.collection.mutable.ArrayBuffer[QueryStats]()
    val l = attach(spark) { e =>
      if (e.progress.name == queryName)
        buf.synchronized { buf += toStats(e.progress): Unit }
    }
    (l, () => buf.synchronized { buf.toList })
  }
}
