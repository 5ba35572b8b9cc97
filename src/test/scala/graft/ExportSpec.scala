package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Export, Mixing}

/** Training-artifact export: layout, manifest-vs-data agreement, and
  * split-level partition pruning on the read path.
  */
class ExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-export").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def shards = {
    // a small end-to-end tail: split bucket + token-budget shard per doc
    val docs = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), size(graft.functions.GraftFunctions.tokens(col("text")))
        .as("n_tokens"))
    graft.operators.PrefixSum.runningSum(
        Mixing.hashSplit(docs, "doc_id", Seq("train" -> 90, "val" -> 10)),
        "n_tokens", Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("split"),
        expr("(running_n_tokens - n_tokens) div 2000").as("shard_id"))
  }

  test("round-trip: written shards read back value-identical; manifest agrees") {
    val root = tmpDir()
    val manifest = Export.writeShards(shards, root, "split", "shard_id", "n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // partition-directory values read back type-inferred (shard_id →
    // int); normalize to the written types before comparing
    val back = spark.read.parquet(root)
      .select(col("doc_id"), col("n_tokens"), col("split"),
        col("shard_id").cast("long").as("shard_id"))
    assert(back.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      shards.select("doc_id", "n_tokens", "split", "shard_id")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq)
    // manifest totals equal a re-scan of the written files
    val rescanned = back.groupBy("split", "shard_id")
      .agg(count(lit(1)).as("n_rows"), sum(col("n_tokens")).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(manifest == rescanned)
    assert(manifest.keySet.map(_._1) == Set("train", "val"))
  }

  test("reading one split prunes the other at the scan") {
    val root = tmpDir()
    Export.writeShards(shards, root, "split", "shard_id", "n_tokens")
    val split = Export.readSplit(spark, root, "train")
    val want = shards.filter(col("split") === "train").count()
    assert(split.count() == want)
    // file-level pruning: the scanned files all live under split=train
    val files = split.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/split=train/")),
      s"scan escaped the split directory: ${files.take(3).mkString(", ")}")
  }
}
