package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

/** Checkpoint-RESTART recovery: the reference runtime has NO checkpointing
  * at all (/root/reference/README.md:36 — bounded queues, in-flight state
  * only), and SURVEY §2.8 claims Spark checkpointing as a strict upgrade.
  * This spec is the direct evidence for that claim on the emit-once
  * operators, whose correctness across a restart rests on the state the
  * checkpoint carries (pane partials + the `firedThroughUs` frontier,
  * interval archives + bucket timers, as-of pending/carry, per-window
  * buffers + end-of-window timers):
  *
  *  1. run a query over phase-A files only (several micro-batches via
  *     maxFilesPerTrigger=1; the watermark advances between batches, so
  *     some windows/pairs fire and their state is evicted mid-run);
  *  2. terminate (AvailableNow drains), then add phase-B files and start a
  *     NEW query instance from the SAME checkpoint;
  *  3. assert exactly-once resumption: run-1 ∪ run-2 output has no
  *     duplicates (nothing already fired re-fires) and equals an
  *     uninterrupted run over all files from a fresh checkpoint (nothing
  *     pending is lost — including cross-boundary join pairs that can only
  *     be produced from RESTORED phase-A archives).
  *
  * Both state store providers are exercised: the default HDFS-backed store
  * and RocksDB (the reference's `wf/persistent/` analog) — recovery reads
  * back through each provider's own snapshot/changelog format.
  *
  * Sink: `foreachBatch` into a driver-side buffer — the memory sink
  * refuses checkpoint recovery in append mode, and foreachBatch is the
  * documented recoverable pattern. Runs terminate cleanly, so batch
  * replay-on-crash (at-least-once at the sink) is not in play; what is
  * under test is OPERATOR state resumption.
  */
class RecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val MinUs = 60L * 1000000L
  private val HourUs = 3600L * 1000000L

  // ---- deterministic two-phase input -------------------------------------
  // Rows at 1-minute event-time spacing; user = i mod 3, side = i mod 2 —
  // key and join side independent, so cross-boundary pairs exist (e.g. a
  // left at minute 238 pairing with a right at minute 241 can only be
  // emitted by run 2 from run 1's restored archive).
  private def mkRows(ids: Range): Seq[(Long, Long, Long, Long, Double, Boolean)] =
    ids.map { i =>
      (i.toLong, (i % 3).toLong, i.toLong * MinUs, (i * 7 % 100).toLong,
        (i % 13).toDouble, i % 2 == 0)
    }

  /** Far-future row (its own key, right side): advances the final
    * watermark past every real window/timer so run 2 (and the
    * uninterrupted run) flush trailing state — the EOS punctuation of the
    * declared queries, here as a plain data row. It lands in a far-future
    * pane/window/bucket that never fires, so it adds no output itself.
    */
  private val Sentinel =
    (999999L, 999L, 1000L * 24 * HourUs, 0L, 0.0d, false)

  /** One parquet file per call, stamped with a strictly-increasing mod
    * time so the file source's (modTime, path) order — and therefore the
    * per-batch watermark sequence — is identical across the interrupted
    * and uninterrupted runs. Only NEW files are stamped: re-stamping a
    * processed file would make the source's seen-files tracker treat it
    * as new and replay it.
    */
  private def writeFile(s: SparkSession, dir: java.io.File,
      rows: Seq[(Long, Long, Long, Long, Double, Boolean)],
      stamped: scala.collection.mutable.Set[String],
      clock: java.util.concurrent.atomic.AtomicLong): Unit = {
    import s.implicits._
    rows.toDF("event_id", "user_id", "ts_us", "cents", "value", "is_left")
      .coalesce(1).write.mode("append").parquet(dir.getPath)
    dir.listFiles().filter(f => f.getName.endsWith(".parquet") &&
        !stamped.contains(f.getName))
      .sortBy(_.getName).foreach { f =>
        f.setLastModified(clock.addAndGet(10000L))
        stamped += f.getName
      }
  }

  private val InputSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("is_left", org.apache.spark.sql.types.BooleanType)))

  private def source(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(InputSchema).option("maxFilesPerTrigger", "1").parquet(dir)
      .withColumn("event_time", expr("timestamp_micros(ts_us)"))
      .withWatermark("event_time", "10 minutes")

  // ---- the four emit-once operator frames --------------------------------

  private def ffatFrame(s: SparkSession, dir: String): DataFrame = {
    implicit val sp = s
    import s.implicits._
    val in = source(s, dir)
      .selectExpr("CAST(user_id AS STRING) AS key", "ts_us", "cents", "event_time")
      .as[FfatInT]
    StatefulOps.slidingWindowsFfatAppend(in, lenUs = HourUs, slideUs = 15L * MinUs).toDF()
  }

  private def intervalFrame(s: SparkSession, dir: String): DataFrame = {
    implicit val sp = s
    import s.implicits._
    val bound = 30L * MinUs
    val in = source(s, dir)
      .selectExpr("event_id", "user_id", "ts_us", "value", "is_left AS isLeft",
        "event_time")
      .as[IjTIn]
    StatefulOps.intervalJoinBucketed(in, bound, bucketUs = bound).toDF()
  }

  private def asofFrame(s: SparkSession, dir: String): DataFrame = {
    implicit val sp = s
    import s.implicits._
    val in = source(s, dir)
      .selectExpr("event_id", "user_id", "ts_us", "value", "is_left AS isLeft",
        "event_time")
      .as[AsofIn]
    StatefulOps.asofJoinShared(in).toDF()
  }

  private def nonincFrame(s: SparkSession, dir: String): DataFrame = {
    implicit val sp = s
    import s.implicits._
    val in = source(s, dir)
      .selectExpr("user_id", s"(ts_us div $HourUs) * $HourUs AS win_start_us",
        "cents", "event_time")
      .as[NonincIn]
    StatefulOps.nonincWindowsAppend(in, HourUs).toDF()
  }

  /** KSlack TTL frame with DISORDER (±6 min jitter on a 20 min watermark
    * delay, so the engine never late-drops): buffers, the adapted K, the
    * last-emitted guard and the `dropped` counter all live in state at
    * the restart boundary, and the emitted `dropped_so_far` values make
    * counter continuity directly visible — a reset counter after restart
    * diverges from the uninterrupted control run.
    */
  private def kslackFrame(s: SparkSession, dir: String): DataFrame = {
    implicit val sp = s
    import s.implicits._
    val in = s.readStream.schema(InputSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withColumn("seq", col("event_id"))
      .withColumn("ts_j", expr(s"ts_us + ((event_id % 5) - 2) * ${3L * MinUs}"))
      .withColumn("event_time", expr("timestamp_micros(ts_j)"))
      .withWatermark("event_time", "20 minutes")
      .selectExpr("user_id", "event_id", "seq", "ts_j AS ts_us", "cents",
        "event_time")
      .as[KsInT]
    KSlack.reorderTtl(in, ttlUs = 30L * MinUs).toDF()
  }

  /** Rolling-reduce TTL frame (update mode): per-key fold sums/counts
    * must continue across the restart — a fold restarted from zero
    * diverges from the control run on every phase-B emission.
    */
  private def rollingFrame(s: SparkSession, dir: String): DataFrame = {
    implicit val sp = s
    import s.implicits._
    val in = source(s, dir)
      .selectExpr("event_id", "user_id", "ts_us", "cents", "event_time")
      .as[EvRowT]
    StatefulOps.rollingReduceTtl(in, ttlUs = 45L * MinUs).toDF()
  }

  // ---- harness -----------------------------------------------------------

  private def runToBuffer(frame: DataFrame, ckpt: String,
      mode: String): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    val q = frame.writeStream
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val rows = df.collect().map(_.toSeq.toString)
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  private def tmpRoot(tag: String): java.io.File = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Files.createTempDirectory("graft").getParent
    java.nio.file.Files.createTempDirectory(base, s"graft-recovery-$tag").toFile
  }

  private def recoveryCase(tag: String, rocksDb: Boolean,
      frame: (SparkSession, String) => DataFrame,
      mode: String): Unit = {
    val s = spark.newSession()
    GraftSession.adopt(s)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    if (rocksDb) s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = tmpRoot(tag)
    val dataDir = new java.io.File(root, "in"); dataDir.mkdirs()
    val ckptInterrupted = new java.io.File(root, "ck-interrupted").getPath
    val ckptFull = new java.io.File(root, "ck-full").getPath
    val stamped = scala.collection.mutable.Set[String]()
    val clock = new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
    try {
      // phase A: two files → two micro-batches; watermark reaches 229 min,
      // so early windows fire and evict DURING run 1
      writeFile(s, dataDir, mkRows(0 until 120), stamped, clock)
      writeFile(s, dataDir, mkRows(120 until 240), stamped, clock)
      val out1 = runToBuffer(frame(s, dataDir.getPath), ckptInterrupted, mode)

      // phase B: two more files + the far-future sentinel that flushes
      // trailing state
      writeFile(s, dataDir, mkRows(240 until 360), stamped, clock)
      writeFile(s, dataDir, mkRows(360 until 480) :+ Sentinel, stamped, clock)
      val out2 = runToBuffer(frame(s, dataDir.getPath), ckptInterrupted, mode)

      // uninterrupted control: fresh checkpoint, same files, same
      // (modTime, path) order → same per-batch watermark sequence
      val full = runToBuffer(frame(s, dataDir.getPath), ckptFull, mode)

      assert(out1.nonEmpty, s"$tag: run 1 emitted nothing — no state fired in phase A")
      assert(out2.nonEmpty, s"$tag: run 2 emitted nothing — nothing resumed from checkpoint")
      val union = out1 ++ out2
      assert(union.size == union.distinct.size,
        s"$tag: restart re-emitted ${union.size - union.distinct.size} rows " +
          "(fired frontier / removed state not restored)")
      assert(union.sorted == full.sorted,
        s"$tag: interrupted union (${union.size} rows) != uninterrupted run " +
          s"(${full.size} rows); " +
          s"missing=${(full.toSet -- union.toSet).take(3)} " +
          s"extra=${(union.toSet -- full.toSet).take(3)}")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root)
  }

  private val cases: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("ffat-append", ffatFrame _, "append"),
    ("interval-bucketed", intervalFrame _, "append"),
    ("asof", asofFrame _, "append"),
    ("noninc-append", nonincFrame _, "append"),
    ("kslack-ttl", kslackFrame _, "append"),
    ("rolling-ttl", rollingFrame _, "update"))

  for ((tag, frame, mode) <- cases) {
    test(s"$tag resumes exactly-once from a checkpoint (HDFS-backed state store)") {
      recoveryCase(tag, rocksDb = false, frame, mode)
    }
    test(s"$tag resumes exactly-once from a checkpoint (RocksDB state store)") {
      recoveryCase(tag, rocksDb = true, frame, mode)
    }
  }
}
