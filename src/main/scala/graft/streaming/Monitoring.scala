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
}
