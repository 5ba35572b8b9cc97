package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for intermediates the library persists (shingle indexes,
  * prefix-scan partials, …) so callers can release them after the result is
  * materialized. A library call that persists and never unpersists leaks
  * MEMORY_AND_DISK blocks into a long-lived session — at 100 TB a single
  * leaked shingle index is executor memory some other stage needed.
  *
  * Pattern: operators persist via [[track]]; the driver-contract mains
  * (Verify/Bench) and specs call [[releaseAll]] after each query's action.
  * Unpersist is non-blocking — block deletion overlaps the next query.
  */
object Caches {
  private val live = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and register it for the next [[releaseAll]]. */
  def track[T](ds: Dataset[T], level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    live.add(ds)
    ds
  }

  /** Unpersist every tracked intermediate (idempotent, non-blocking). */
  def releaseAll(): Unit = {
    var ds = live.poll()
    while (ds != null) {
      ds.unpersist(blocking = false)
      ds = live.poll()
    }
  }
}
