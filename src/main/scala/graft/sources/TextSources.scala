package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Raw-corpus ingestion for the formats web-scale text actually arrives
  * in: JSONL (one JSON object per line — the lingua franca of crawl dumps
  * and dataset releases) and headered CSV. Thin, deliberate wrappers over
  * Spark's native readers (Catalyst keeps column pruning and partition
  * parallelism) with the 100 TB policies fixed:
  *
  *   - EXPLICIT schema, never `inferSchema`: inference is a full extra
  *     scan of the corpus before the first real one;
  *   - PERMISSIVE with a corrupt-record column: a web-scale dump WILL
  *     contain malformed lines; failing the job on one is not an option
  *     and silently dropping them is not auditable — they land whole in
  *     [[CorruptCol]] for quarantine/repair (spec-asserted);
  *   - `multiLine` stays off: line-delimited files split at block
  *     boundaries, so a single 1 TB file still fans out across the
  *     cluster; multiLine JSON is one task per file.
  */
object TextSources {

  val CorruptCol = "_corrupt_record"

  /** The documents-table schema (TESTDATA.md) as the default contract. */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType))

  def jsonl(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def csv(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Clean/quarantine split: (parsed rows sans corrupt column, corrupt
    * raw lines). The parsed frame is cached first — Spark refuses plans
    * that reference ONLY the corrupt-record column of a raw scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN; the
    * documented contract is cache-then-split), and the cache also makes
    * the two sides one physical scan. At 100 TB the quarantine side is
    * the audit trail; the cache would be a checkpointed staging table.
    */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = graft.Caches.track(df)
    (parsed.filter(parsed(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(parsed(CorruptCol).isNotNull).select(CorruptCol))
  }
}
