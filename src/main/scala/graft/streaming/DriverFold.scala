package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

/** Harness + persistence for DRIVER-side cross-batch fold state — the
  * shape every sketch-at-ingestion operator shares (incremental heavy
  * hitters, KMV distinct counting, bottom-k sampling, histogram
  * profiling): each micro-batch reduces IN THE CLUSTER to a bounded
  * summary (one aggregation row / ≤ k rows), which then merges into
  * running driver state with the sketch's own mergeable combine. The
  * state is O(sketch) bytes however long the stream runs — but it lives
  * on the driver, so without persistence a restart would silently forget
  * every batch the checkpoint's offset log says are done.
  *
  * [[save]]/[[loadLatest]] are the commit protocol the export writer and
  * [[graft.text.CorpusStats]]'s HhState use, factored for reuse: after
  * folding batch b the caller persists (b, payload) via atomic
  * tmp+rename, so on restart the newest file IS the last completed fold
  * and every batch id at or below it must skip its merge on replay
  * (idempotence). Either crash window is safe: before the state write,
  * the replayed batch re-merges from the previous fold (the partial
  * never persisted); after it, the id check skips the merge (the offset
  * commit is the only thing the crash lost). All but the newest two
  * files are pruned on each save.
  */
object DriverFold {
  import java.nio.file.{Files, Paths, StandardCopyOption}
  private val Pat = """fold-(\d+)\.bin""".r

  def save(dir: String, batchId: Long, payload: Array[Byte]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putLong(batchId); bb.put(payload)
    val tmp = Paths.get(dir, s".fold-$batchId.tmp")
    Files.write(tmp, bb.array())
    Files.move(tmp, Paths.get(dir, s"fold-$batchId.bin"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    batchIds(dir).sorted.dropRight(2)
      .foreach(b => Files.deleteIfExists(Paths.get(dir, s"fold-$b.bin")))
  }

  def loadLatest(dir: String): Option[(Long, Array[Byte])] = {
    val ids = batchIds(dir)
    if (ids.isEmpty) None
    else {
      val b = ids.max
      val bytes = Files.readAllBytes(Paths.get(dir, s"fold-$b.bin"))
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val batchId = bb.getLong
      val rest = new Array[Byte](bytes.length - 8)
      bb.get(rest)
      Some((batchId, rest))
    }
  }

  private def batchIds(dir: String): Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.list().toSeq.collect { case Pat(b) => b.toLong }
  }

  /** Run `stream` to completion (AvailableNow) through a foreachBatch
    * fold. `onBatch` receives every (batch, batchId) — idempotence
    * against replayed ids is the CALLER's job (it owns the persisted
    * fold watermark). Checkpoint handling matches
    * [[StreamRun.toBatch]]: tmpfs when no explicit location is given,
    * deleted on exit (an explicit checkpoint — the restart-evidence
    * path — is kept).
    */
  def run(stream: DataFrame, onBatch: (Dataset[Row], Long) => Unit,
      checkpoint: Option[String] = None)(
      implicit spark: SparkSession): Unit = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val ckpt = checkpoint.getOrElse(
      java.nio.file.Files.createTempDirectory(base, "graft-fold").toString)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(batch, batchId)
        ()
      }
      .start()
    try q.awaitTermination()
    finally if (checkpoint.isEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }
}
