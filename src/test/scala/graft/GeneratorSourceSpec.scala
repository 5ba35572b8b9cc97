package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.sources.GeneratorSource
import graft.streaming.{StreamRun, StreamSources}

/** Custom generator DataSourceV2 source (wf/source_shipper.hpp user-loop
  * Source): replica loops run as executor partitions; EVENT policy carries
  * the generator-supplied timestamps, INGRESS stamps arrival time.
  */
class GeneratorSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(StructField("id", LongType)))

  test("replica loops emit disjoint rows with EVENT timestamps end-to-end") {
    implicit val s = spark
    GeneratorSource.register("spec_gen", GeneratorSource.GenDef(
      schema, numReplicas = 3,
      (r, emit) => (0L until 40L).foreach(i =>
        emit(Array[Any](r * 40L + i), 1_000_000L + (r * 40L + i)))))
    val out = StreamRun.toBatch(
      StreamSources.generator(spark, "spec_gen"), "append")
      .select("id", "ts_us", "event_time").orderBy("id").collect()
    assert(out.length == 120)
    assert(out.map(_.getLong(0)).toSeq == (0L until 120L).toSeq)
    assert(out.forall(r => r.getLong(1) == 1_000_000L + r.getLong(0)))
    // event_time is the same instant as ts_us
    assert(out.forall(r =>
      r.getTimestamp(2).toInstant.toEpochMilli * 1000L +
        (r.getTimestamp(2).getNanos / 1000) % 1000 == r.getLong(1)))
  }

  test("a 10^6-row replica streams through in bounded memory (no materialization)") {
    implicit val s = spark
    val n = 1000000L
    GeneratorSource.register("spec_gen_big", GeneratorSource.GenDef(
      schema, numReplicas = 2,
      (r, emit) => {
        var i = 0L
        while (i < n) { emit(Array[Any](r * n + i), 1_000_000L + i); i += 1L }
      }))
    GeneratorSource.resetPeakBuffered()
    val cnt = StreamRun.toBatch(
      StreamSources.generator(spark, "spec_gen_big"), "append")
      .agg(count(lit(1)), sum("id")).collect()(0)
    assert(cnt.getLong(0) == 2L * n)
    assert(cnt.getLong(1) == (2L * n - 1L) * n) // sum 0..2n-1
    val peak = GeneratorSource.peakBufferedRows
    val bound = graft.sources.GenPartitionReader.QueueChunks.toLong *
      graft.sources.GenPartitionReader.ChunkRows + graft.sources.GenPartitionReader.ChunkRows
    assert(peak > 0 && peak <= bound,
      s"reader buffered $peak rows — the replica slice must stream, not materialize (bound $bound)")
  }

  test("admission control paces the stream into capped micro-batches") {
    // maxRowsPerBatchPerReplica is the rate/kafka maxOffsetsPerTrigger
    // contract: each batch advances every replica's offset by at most the
    // cap, so a long stream becomes MANY batches (watermarks advance
    // between them — what ScaleStressSpec relies on); every row still
    // arrives exactly once
    implicit val s = spark
    GeneratorSource.register("spec_gen_paced", GeneratorSource.GenDef(
      schema, numReplicas = 2,
      (r, emit) => (0L until 500L).foreach(i =>
        emit(Array[Any](r * 500L + i), 1_000_000L + i))))
    val q = StreamSources.generator(spark, "spec_gen_paced",
        maxRowsPerBatchPerReplica = 100L)
      .writeStream.format("memory").queryName("gen_paced_x")
      .outputMode("append").start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    val got = spark.table("gen_paced_x").select("id").collect().map(_.getLong(0)).sorted
    spark.sql("DROP TABLE IF EXISTS gen_paced_x")
    assert(got.toSeq == (0L until 1000L).toSeq, s"lost/duplicated rows: ${got.length}")
    assert(batches == 5, s"500 rows/replica at cap 100 must take 5 data batches, got $batches")
  }

  test("Trigger.AvailableNow honors the admission cap: paced batches, then termination") {
    // without SupportsTriggerAvailableNow Spark silently falls back to a
    // SINGLE batch under AvailableNow and ignores the cap — the trap the
    // streaming-funnel battery hit; this pins the paced-run-then-stop
    // contract (the kafka source's behavior) on the generator source
    implicit val s = spark
    GeneratorSource.register("spec_gen_an", GeneratorSource.GenDef(
      schema, numReplicas = 2,
      (r, emit) => (0L until 300L).foreach(i =>
        emit(Array[Any](r * 300L + i), 1_000_000L + i))))
    val q = StreamSources.generator(spark, "spec_gen_an",
        maxRowsPerBatchPerReplica = 100L)
      .writeStream.format("memory").queryName("gen_an_x")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination() // AvailableNow terminates on its own
    val batches = q.recentProgress.count(_.numInputRows > 0)
    val got = spark.table("gen_an_x").select("id").collect().map(_.getLong(0)).sorted
    spark.sql("DROP TABLE IF EXISTS gen_an_x")
    assert(got.toSeq == (0L until 600L).toSeq, s"lost/duplicated rows: ${got.length}")
    assert(batches == 3, s"300 rows/replica at cap 100 must take 3 data batches, got $batches")
  }

  test("INGRESS policy stamps arrival time instead of the generator ts") {
    implicit val s = spark
    GeneratorSource.register("spec_gen_ingress", GeneratorSource.GenDef(
      schema, numReplicas = 1,
      (_, emit) => (0L until 10L).foreach(i => emit(Array[Any](i), 42L))))
    val before = System.currentTimeMillis() * 1000L
    val out = StreamRun.toBatch(
      StreamSources.generator(spark, "spec_gen_ingress", policy = "ingress"), "append")
      .select("ts_us").collect()
    val after = System.currentTimeMillis() * 1000L
    assert(out.length == 10)
    assert(out.forall { r =>
      val t = r.getLong(0); t >= before && t <= after
    }, "ingress timestamps must be arrival wall-clock, not the generator's 42µs")
  }
}
