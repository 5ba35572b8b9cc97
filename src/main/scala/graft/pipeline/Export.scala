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
