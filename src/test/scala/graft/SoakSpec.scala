package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StatefulOps, StreamSources}

/** Continuous-trigger soak (env-gated with the scale stress): the bounded
  * AvailableNow verification runs hide slow state leaks — a retained-set
  * that grows by a sliver per batch still finishes the run. This spec
  * runs a ProcessingTime(0) trigger — the actual continuous-deployment
  * shape — for ≥ 20 paced micro-batches over a generator stream, then
  * reads the state STORE back at a ladder of committed batch ids
  * (`minBatchesToRetain` raised so every version survives) and asserts
  * the steady-state state volume is FLAT batch-over-batch for the two
  * operators with the most intricate eviction machinery:
  *
  *  - `slidingWindowsFfatAppend`: total pane partials across keys;
  *  - `intervalJoinShared`: total buffered archive rows across keys.
  *
  * "Flat" is asserted on the *content* of the state blobs (panes /
  * archive entries decoded per group), not on the group count — the
  * group count is constant by construction (one row per key), and the
  * round-7 watermark-pruning bug this guards against grew precisely the
  * inside of the blobs while the group count stayed put. Warmup batches
  * are skipped: purge only starts once the watermark is established
  * (batch 3+); from there the retained window is constant by design.
  */
class SoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val enabled = sys.env.contains("SPARK_GRAFT_SCALE_STRESS")

  private val Replicas = 4
  private val Keys = 200L
  private val StepUs = 1000L
  private val BaseUs = 1600000000000000L
  private val PerBatchPerReplica = 25_000L
  private val TotalRows = 3_000_000L // 30 paced data batches of 100k rows
  private val DelayS = 10L

  private def registerGen(name: String): Unit = {
    val perReplica = TotalRows / Replicas
    graft.sources.GeneratorSource.register(name,
      graft.sources.GeneratorSource.GenDef(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType))),
        Replicas,
        (r, emit) => {
          var i = 0L
          while (i < perReplica) {
            val global = i * Replicas + r
            emit(Array[Any](global, global % Keys, (global * 37) % 10000),
              BaseUs + global * StepUs)
            i += 1L
          }
        }))
  }

  /** Runs the frame under a ProcessingTime(0) trigger until all generator
    * rows are ingested (polled via progress), stops, and returns the
    * checkpoint plus the data-batch ids observed.
    */
  private def soak(genName: String, mode: String)(
      build: DataFrame => DataFrame): (String, Seq[Long]) = {
    registerGen(genName)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_soak_$genName").toString
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // keep every committed state version readable after the run
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "100")
    val dataBatches = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      val src = StreamSources.generator(spark, genName,
        maxRowsPerBatchPerReplica = PerBatchPerReplica)
      val q = build(src).writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(Trigger.ProcessingTime(0L))
        .start()
      var seen = 0L
      val deadline = System.currentTimeMillis() + 600000
      while (seen < TotalRows && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        val progs = q.recentProgress
        seen = progs.map(_.numInputRows).sum
        dataBatches.clear()
        dataBatches ++= progs.filter(_.numInputRows > 0).map(_.batchId)
      }
      assert(seen >= TotalRows, s"soak timed out: ingested $seen of $TotalRows rows")
      q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
    }
    (ckpt, dataBatches.toSeq.sorted)
  }

  /** Total decoded state volume at one committed batch id. */
  private def stateVolumeAt(ckpt: String, batchId: Long,
      measure: org.apache.spark.sql.Row => Long): Long =
    spark.read.format("statestore").option("batchId", batchId.toString)
      .load(ckpt).collect().iterator.map { r =>
        val v = r.getStruct(r.fieldIndex("value"))
        measure(v.getStruct(v.schema.fieldNames.indexOf("groupState")))
      }.sum

  /** Steady-state batches: skip the warmup (purge starts once the
    * watermark is established) and the final batch (the trailing no-data
    * flush may land there), then assert the volume curve is flat.
    */
  private def assertFlat(tag: String, ckpt: String, batches: Seq[Long],
      measure: org.apache.spark.sql.Row => Long): Unit = {
    assert(batches.size >= 20, s"$tag: expected >= 20 data batches, got ${batches.size}")
    val steady = batches.drop(5).dropRight(1)
    val volumes = steady.map(b => stateVolumeAt(ckpt, b, measure))
    info(s"$tag: state volume over batches ${steady.head}..${steady.last} = $volumes")
    val mx = volumes.max
    val mn = volumes.min
    assert(mn > 0, s"$tag: empty steady-state volume — measure decoded nothing")
    assert(mx <= mn * 3 / 2 + 8,
      s"$tag: state volume not flat batch-over-batch (min $mn, max $mx over $volumes) — " +
        "a slow leak the bounded runs would hide")
    // no monotonic creep either: the last steady batch must not be the
    // unique running maximum by a margin
    assert(volumes.last <= mn * 3 / 2 + 8,
      s"$tag: volume still climbing at the end of the soak: $volumes")
  }

  test("soak: ffat-append pane volume is flat over 20+ continuous-trigger batches") {
    assume(enabled, "set SPARK_GRAFT_SCALE_STRESS=1 to run")
    import spark.implicits._
    val (ckpt, batches) = soak("soak_ffat", "append") { src =>
      StatefulOps.slidingWindowsFfatAppend(
        src.withWatermark("event_time", s"$DelayS seconds")
          .selectExpr("CAST(key AS STRING) AS key", "ts_us", "cents", "event_time")
          .as[graft.streaming.FfatInT],
        lenUs = 60L * 1000000L, slideUs = 15L * 1000000L)(spark).toDF()
    }
    assertFlat("ffat-append", ckpt, batches,
      gs => gs.getSeq[Long](gs.schema.fieldNames.indexOf("paneTs")).size.toLong)
  }

  test("soak: interval-join archive volume is flat over 20+ continuous-trigger batches") {
    assume(enabled, "set SPARK_GRAFT_SCALE_STRESS=1 to run")
    import spark.implicits._
    val (ckpt, batches) = soak("soak_ij", "append") { src =>
      StatefulOps.intervalJoinShared(
        src.withWatermark("event_time", s"$DelayS seconds")
          .selectExpr("id AS event_id", "key AS user_id", "ts_us",
            "CAST(cents AS DOUBLE) / 100.0 AS value", "id % 5 = 0 AS isLeft",
            "event_time")
          .as[graft.streaming.IjIn],
        boundUs = 5L * 1000000L)(spark).toDF()
    }
    assertFlat("interval-join", ckpt, batches,
      gs => (gs.getSeq[org.apache.spark.sql.Row](gs.schema.fieldNames.indexOf("left")).size +
        gs.getSeq[org.apache.spark.sql.Row](gs.schema.fieldNames.indexOf("right")).size).toLong)
  }
}
