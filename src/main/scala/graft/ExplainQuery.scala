package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named registry queries — the plan
  * evidence the optimization rounds commit under `plans/r16/`.
  *
  * Usage: sbt "runMain graft.ExplainQuery <outDir> <query>[,<query>...]"
  *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS (default 32),
  *        SPARK_GRAFT_EXPLAIN_SUFFIX (default "before" — file suffix).
  * Not part of the driver contract.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainQuery <outDir> <query>[,<query>...]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = args.drop(1).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-explain"),
      shufflePartitions = cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // lookup inside the try (r16 advice): one typo in a comma list must
      // not abort the run and discard the remaining plans
      try {
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query: $name (see SparkEntry.queries)"))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[explain] wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
      } catch { case t: Throwable =>
        System.err.println(s"[explain] $name failed: ${t.getMessage}")
      } finally Caches.releaseAll()
    }
    spark.stop()
  }
}
