package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All loaders are plain parquet scans so Catalyst keeps predicate pushdown
  * and column pruning — callers `.select`/`.filter` and the parquet reader
  * sees `PushedFilters`/`ReadSchema`. At 100 TB these would be the same
  * calls against a partitioned table root; nothing here assumes single-file
  * inputs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") GraftSession.adopt(spark) // ns timestamps → Long
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with `ts` as int64 epoch nanoseconds (column `ts`) — the
    * engine-wide contract every downstream `ts div 1000` (→ µs) relies
    * on. The driver's parquet has carried two encodings across rounds:
    * TIMESTAMP(NANOS), which Spark only reads as a raw Long (SPARK-40819,
    * the `nanosAsLong` conf — already nanos, passed through), and
    * TIMESTAMP(MICROS), which reads as a timestamp type and is converted
    * here (µs × 1000). The conversion is exact integer arithmetic; with
    * the session pinned to UTC (GraftSession) the NTZ reading equals
    * DuckDB's `epoch_us(ts)` value-for-value, so oracle comparisons stay
    * integer-exact under either encoding.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.withColumn("ts", tsAsNanos(df.schema("ts").dataType))
  }

  /** Normalizer behind [[events]] / the streaming twin: `ts` → int64
    * epoch nanos whatever the parquet logical type was.
    */
  def tsAsNanos(dt: DataType): Column = dt match {
    case LongType => expr("ts") // TIMESTAMP(NANOS) read raw via nanosAsLong
    case TimestampNTZType => expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000")
    case TimestampType => expr("unix_micros(ts) * 1000")
    case other => throw new IllegalStateException(
      s"events.ts: unsupported parquet reading $other (expected raw-nanos " +
        "Long or a microsecond timestamp type)")
  }
}
