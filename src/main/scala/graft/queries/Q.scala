package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an exact DuckDB oracle. The driver
  * hash-compares both at sf0.01 (see SparkEntry / Verify).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    // MEASUREMENT rows (recall gates, calibration sweeps, the configs
    // they derive) price deliberate quality measurement, not engine
    // operators; Bench reports the two lanes separately
    // (total_engine/total_measurement) and pre-commits their persisted
    // artifacts in the untimed setup pass — the nightly-gate-job shape
    measurement: Boolean = false)

object Q {
  /** Events time convention: `Tables.events` normalizes `ts` to int64
    * epoch NANOS whatever the driver's parquet encoding (raw Long for
    * TIMESTAMP(NANOS) via nanosAsLong; exact µs×1000 for the
    * TIMESTAMP(MICROS) encoding rounds ≥ 10 generate). DuckDB reads the
    * same column at microsecond precision, so `ts div 1000` (Spark) ==
    * `epoch_us(ts)` (DuckDB), integer-exact. All window/join arithmetic
    * runs on int64 microseconds.
    */
  val TsUsSpark = "ts div 1000"
  val TsUsDuck = "epoch_us(ts)"

  val HourUs: Long = 3600L * 1000000L
  val MinuteUs: Long = 60L * 1000000L

  /** documents/embeddings are not in TESTDATA.md's registered-table list,
    * so their oracles read the parquet directly; Verify substitutes
    * {SFDIR} with the actual scale-factor dir when dumping
    * oracle_sql.json (works whether or not the driver registers views).
    */
  val DocsRef = "read_parquet('{SFDIR}/documents.parquet')"
  val EmbRef = "read_parquet('{SFDIR}/embeddings.parquet')"
}
