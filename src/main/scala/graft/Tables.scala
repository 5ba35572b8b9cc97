package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** `events` with `ts` as int64 epoch nanoseconds (column `ts`). */
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
}
