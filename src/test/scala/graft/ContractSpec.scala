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

  test("every query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) { assert(fn(spark, TestSpark.SF).count() >= 0) }
    }
  }
}
