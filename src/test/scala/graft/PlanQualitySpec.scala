package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: the properties that matter at 100 TB must
  * be visible in the physical plan (pushdown, pruning, broadcast, partial
  * aggregation) — SURVEY §4.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, TestSpark.SF)
    df.queryExecution.executedPlan.toString
  }

  test("filters are pushed into the parquet scan") {
    val p = plan("filter_predicate")
    assert(p.contains("PushedFilters: [") && p.contains("event_type"), p.take(2000))
  }

  test("column pruning reaches the scan (map_project reads 6 of 11 columns)") {
    val p = plan("map_project")
    assert(p.contains("ReadSchema") && !p.contains("l_returnflag"), p.take(2000))
  }

  test("small dimension join is broadcast") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("aggregation is partial -> final (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("interval join is a key-equi join, not a cartesian product") {
    val p = plan("interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(3000))
  }
}
