package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-artifact export — the last step of a curation run: write the
  * assembled examples as split/shard-partitioned parquet plus a manifest
  * the trainer (and the next incremental run) can trust without listing
  * or re-scanning the data.
  *
  * Layout: `<root>/split=<s>/shard_id=<k>/part-*.parquet` via Spark's
  * `partitionBy` — Hive-style directories, so a trainer reading one split
  * prunes everything else at the FILE level (partition pruning,
  * plan-asserted in spec), and a shard maps to a stable directory a data
  * loader can address directly. One shuffle-free write: `partitionBy`
  * routes rows by column value within each task, so the writer preserves
  * the upstream partitioning (repartition first if shard-directory file
  * counts matter more than avoiding the exchange).
  *
  * Manifest: `<root>/_graft_manifest/` — one parquet row per (split,
  * shard): row count + exact token sum. Written AFTER the data (a
  * manifest that exists implies its shards are complete — the
  * two-phase-commit-lite every file-based pipeline needs), derived from
  * the same DataFrame in the same job, and verified in spec against a
  * re-scan of the written files.
  */
object Export {

  val ManifestDir = "_graft_manifest"

  /** Write `df` partitioned by (splitCol, shardCol) with a per-shard
    * manifest; returns the manifest as a DataFrame. `tokenCol` is the
    * exact-summable per-row token count the manifest totals.
    */
  def writeShards(df: DataFrame, root: String, splitCol: String,
      shardCol: String, tokenCol: String): DataFrame = {
    val data = graft.Caches.track(df)
    data.write.mode(SaveMode.Overwrite)
      .partitionBy(splitCol, shardCol)
      .parquet(root)
    val manifest = data.groupBy(col(splitCol), col(shardCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(tokenCol)).as("n_tokens"))
    manifest.write.mode(SaveMode.Overwrite).parquet(s"$root/$ManifestDir")
    manifest
  }

  /** Streaming terminal stage — the batch writer's contract held PER
    * MICRO-BATCH: each trigger appends its rows to the same Hive-style
    * shard tree (with the batch id as a third partition level, so every
    * batch's files live in addressable `…/split=<s>/shard_id=<k>/
    * batch=<b>/` leaves) and then — only after the data is fully
    * written — commits a per-batch manifest at
    * `_graft_manifest/batch=<b>/`. The manifest is the commit marker:
    * two-phase-commit-lite per batch, so a reader trusting the manifest
    * never sees a half-written batch.
    *
    * Restart safety (exactly-once against the data tree): foreachBatch
    * replays the last uncommitted batch id after a crash, so the writer
    * is idempotent per batch — a batch whose manifest exists is skipped
    * whole; a batch whose manifest is missing first scrubs its own
    * batch-tagged data leaves (the partials of the crashed attempt —
    * addressable precisely BECAUSE the batch id is a partition level)
    * and rewrites. Append without the tag could not be made idempotent:
    * parquet part files get fresh UUID names per attempt, so a replay
    * would silently double the batch.
    *
    * `beforeCommit` runs between the data write and the manifest write —
    * the crash window the design defends; specs inject faults there.
    */
  def writeShardsIngest(stream: DataFrame, root: String, splitCol: String,
      shardCol: String, tokenCol: String, checkpoint: String,
      beforeCommit: Long => Unit = _ => ()): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        writeShardsBatch(df, root, splitCol, shardCol, tokenCol, batchId,
          beforeCommit)
      }
      .start()
    q.awaitTermination()
  }

  /** One micro-batch's idempotent shard append (see
    * [[writeShardsIngest]]). Public so a caller wiring its own
    * foreachBatch (different trigger, extra sinks) reuses the exact
    * commit protocol.
    */
  def writeShardsBatch(df: DataFrame, root: String, splitCol: String,
      shardCol: String, tokenCol: String, batchId: Long,
      beforeCommit: Long => Unit = _ => ()): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val mPath = new org.apache.hadoop.fs.Path(s"$root/$ManifestDir/batch=$batchId")
    val fs = mPath.getFileSystem(hconf)
    if (fs.exists(mPath)) return // fully committed by a prior attempt
    // scrub partial data from a crashed attempt: exactly the three-level
    // batch=<id> leaves (the two-level manifest path cannot match)
    val partials = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/*/*/batch=$batchId"))
    if (partials != null)
      partials.foreach(st => fs.delete(st.getPath, true))
    // the batch feeds the data write AND the manifest aggregation — one
    // persist, released before the next trigger
    val data = df.persist()
    try {
      data.withColumn("batch", lit(batchId))
        .write.mode(SaveMode.Append)
        .partitionBy(splitCol, shardCol, "batch")
        .parquet(root)
      val manifest = data.groupBy(col(splitCol), col(shardCol))
        .agg(count(lit(1)).as("n_rows"), sum(col(tokenCol)).as("n_tokens"))
      beforeCommit(batchId)
      manifest.write.mode(SaveMode.Overwrite).parquet(mPath.toString)
    } finally data.unpersist(blocking = false)
  }

  /** The ingest manifest: one row per (split, shard, batch) — only
    * COMMITTED batches appear (the manifest is the commit marker), so
    * aggregating it equals a re-scan of exactly the trustworthy data.
    */
  def readIngestManifest(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    spark.read.parquet(s"$root/$ManifestDir")
      .withColumn("batch", col("batch").cast("long"))

  /** Read a split back through the partition-pruned path. */
  def readSplit(spark: org.apache.spark.sql.SparkSession, root: String,
      split: String): DataFrame = {
    // the manifest directory is not Hive-partitioned data; read the
    // partitioned tree by its root and prune on the split column
    spark.read.option("basePath", root)
      .parquet(root + "/split=" + split)
  }

  def readManifest(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/$ManifestDir")
}
