package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Stream ingestion — the reference's `Source` / `Kafka_Source` surface
  * (SURVEY §2.1).
  *
  * WindFlow sources are user generator loops pushing tuples with either
  * EVENT_TIME (user-supplied ts, /root/reference/wf/source_shipper.hpp:248)
  * or INGRESS_TIME (arrival-stamped, wf/source_shipper.hpp:255-256), plus
  * explicit watermark control (wf/source_shipper.hpp:328-336). In Spark:
  *  - a source is any `readStream` (file/rate/kafka) or `MemoryStream`;
  *  - EVENT_TIME = a data column + `withWatermark(col, delay)` — the delay
  *    is the reference's `withLateness` (wf/builders.hpp:773);
  *  - INGRESS_TIME = stamping `current_timestamp()` at ingestion;
  *  - watermark generation/merging (min across inputs,
  *    wf/watermark_collector.hpp:24-34) is Spark-internal.
  */
object StreamSources {

  /** The driver's events table as a file stream (exact schema of the batch
    * reader, so batch and streaming runs are comparable row-for-row).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    GraftSession.adopt(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file stream sources take directories; select just the events table
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }

  /** events with the engine's standard event-time columns: int64 µs
    * (`ts_us`) and TimestampType (`event_time`) for window()/watermarks.
    */
  def eventsWithTime(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("event_time", expr("timestamp_micros(ts div 1000)"))

  /** INGRESS_TIME flavor: arrival-stamped synthetic rate source
    * (wf/source_shipper.hpp:255-256 semantics).
    */
  def rate(spark: SparkSession, rowsPerSecond: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .withColumn("event_time", col("timestamp")) // rate stamps arrival time

  /** Custom generator source (reference: user loop pushing tuples,
    * wf/source_shipper.hpp:171-335): a [[graft.sources.GeneratorSource]]
    * registration run as a DataSourceV2 micro-batch stream, one executor
    * partition per replica. `policy` = "event" (generator-supplied ts) or
    * "ingress" (arrival-stamped).
    */
  def generator(spark: SparkSession, name: String, policy: String = "event"): DataFrame =
    spark.readStream
      .format(classOf[graft.sources.GeneratorSourceProvider].getName)
      .option("generator", name)
      .option("timePolicy", policy)
      .load()

  /** Kafka source passthrough (reference: wf/kafka/kafka_source.hpp:134).
    * The value-deserializing `map` the reference requires is the caller's
    * `.select(expr("CAST(value AS STRING)"), ...)`. Untestable in this
    * container (no broker) — config construction covered by spec.
    */
  def kafka(spark: SparkSession, bootstrap: String, topics: Seq[String],
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load()

  /** Typed-builder flavor mirroring the reference's KafkaSource_Builder
    * option-for-option ([[graft.sources.KafkaSourceConfig]]).
    */
  def kafka(spark: SparkSession, config: graft.sources.KafkaSourceConfig): DataFrame =
    spark.readStream.format("kafka").options(config.options).load()
}
