package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: every query runs at sf0.001, every oracle key
  * has a query, the flagship entry returns rows.
  */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query executes at sf0.001 — with codegen fallback forbidden") {
    // CODEGEN_ONLY + fallback=false turn any Janino compile failure into a
    // hard error instead of a silent interpreter de-optimization (the r2
    // ArrayDotProduct bug ran 9 hot paths interpreted without failing a
    // single test); every declared plan must compile cleanly
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      SparkEntry.queries.foreach { case (name, fn) =>
        withClue(name) { assert(fn(spark, TestSpark.SF).count() >= 0) }
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("bench reports a broken query as an error, not a fast time") {
    val line = Bench.renderLine(Seq(
      ("good", 1.25, None),
      ("broken", 0.003, Some("AnalysisException"))), "/x")
    assert(line.contains(""""queries_err":{"broken":"AnalysisException"}"""), line)
    assert(!line.contains(""""broken":0.003"""), "failed query leaked into timings: " + line)
    assert(line.contains(""""value":1.25"""), "total must exclude failed queries: " + line)
    // the measured streaming floor is part of the artifact (-1 = unmeasured)
    assert(line.contains(""""floor_s":-1.0"""), line)
    assert(Bench.renderLine(Seq(("good", 1.0, None)), "/x", floorS = 2.5)
      .contains(""""floor_s":2.5"""), "explicit floor must land in the line")
  }

  test("bench self-defense: prior timings round-trip and re-measures land in the artifact") {
    // parseQueries inverts renderLine — the cross-round comparison reads
    // exactly what the previous round wrote
    val prevLine = Bench.renderLine(Seq(
      ("q_fast", 0.42, None), ("q_slow", 3.5, None),
      ("broken", 0.1, Some("Boom"))), "/sf")
    val prev = Bench.parseQueries(prevLine)
    assert(prev == Map("q_fast" -> 0.42, "q_slow" -> 3.5), prev)
    // a re-measured entry records BOTH numbers so the artifact defends
    // its own outliers
    val line = Bench.renderLine(Seq(("q_slow", 3.6, None)), "/sf",
      remeasured = Map("q_slow" -> (9.9, 3.6)))
    assert(line.contains(""""remeasured":{"q_slow":{"first":9.9,"fresh":3.6}}"""), line)
    assert(line.contains(""""q_slow":3.6"""), line)
  }

  test("history medians window over the last N RUNS, not the last N sightings") {
    // a query absent from recent runs must NOT backfill its window from
    // arbitrarily old rounds — old values outside the run window are dead
    val hist = Seq(
      Map("q" -> 100.0), Map("q" -> 100.0), Map("q" -> 100.0), // old rounds
      Map.empty[String, Double], Map.empty[String, Double],    // q absent
      Map.empty[String, Double], Map.empty[String, Double],
      Map("q" -> 2.0))                                         // recent
    val med = Bench.historyMedians(hist, Map("q" -> 4.0), lastN = 5)
    // window = last 5 runs → values {2.0, 4.0}; median 4.0. The buggy
    // per-sighting window would see {100,100,100,2,4} → median 100.
    assert(med("q") == 4.0, s"expected 4.0 (run-window median), got ${med("q")}")
    // and a brand-new query's median is its own measured time
    assert(Bench.historyMedians(Nil, Map("new" -> 1.5))("new") == 1.5)
  }
}
