package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TextSources

/** JSONL/CSV ingestion: round-trip identity against the parquet source,
  * corrupt-line quarantine (no job failure, no silent drop), and column
  * pruning reaching the scan.
  */
class TextSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("jsonl round-trip matches the parquet source; corrupt lines quarantine") {
    val docs = Tables.documents(spark, TestSpark.SF)
    val dir = tmpDir("graft-jsonl")
    docs.coalesce(1).write.mode("overwrite").json(s"$dir/out")
    // plant two malformed lines as an additional file in the directory
    // (appending to Spark's own part file would invalidate its .crc)
    val extra = "{\"doc_id\": 999999, \"text\": \"trunc"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/out/extra.json"),
      s"$extra\nnot json at all\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val read = TextSources.jsonl(spark, s"$dir/out")
    val (clean, corrupt) = TextSources.splitCorrupt(read)
    val want = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val got = clean.select(docs.columns.map(col): _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want, "clean side must be value-identical to the parquet source")
    val q = corrupt.collect().map(_.getString(0)).toSet
    assert(q == Set(extra, "not json at all"),
      "both malformed lines must land whole in the quarantine column")
  }

  test("csv round-trip matches the parquet source") {
    // the synthetic text contains no newlines; quoting covers commas
    val docs = Tables.documents(spark, TestSpark.SF)
    val dir = tmpDir("graft-csv")
    docs.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$dir/out")
    val got = TextSources.csv(spark, s"$dir/out")
    val (clean, _) = TextSources.splitCorrupt(got)
    assert(clean.select(docs.columns.map(col): _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("column pruning reaches the json scan") {
    val docs = Tables.documents(spark, TestSpark.SF)
    val dir = tmpDir("graft-jsonl-prune")
    docs.coalesce(1).write.mode("overwrite").json(s"$dir/out")
    val p = TextSources.jsonl(spark, s"$dir/out")
      .select("doc_id").queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && !p.contains("text"),
      "projection must prune the text column at the scan: " + p.take(2000))
  }
}
