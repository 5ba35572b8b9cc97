package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}

/** Unit edges of the batch join operators (the oracle queries cover the
  * common paths on real tables; these pin the corner semantics).
  */
class JoinOperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("band self-join pairs negative values correctly (floor-division buckets)") {
    import spark.implicits._
    // straddles zero and negative bucket boundaries: width 2 ⇒ qualifying
    // pairs are exactly those with |a−b| ≤ 1
    val vals = Seq(1L -> -3L, 2L -> -2L, 3L -> -1L, 4L -> 0L, 5L -> 1L, 6L -> -101L)
    val df = vals.toDF("id", "v")
    val got = RangeJoin.bandSelfJoin(df, "id", "v", width = 2L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (ia, va) <- vals; (ib, vb) <- vals
      if ia < ib && math.abs(va - vb) < 2L
    } yield (ia, ib)).toSet
    assert(got == want, s"got $got want $want")
  }

  test("as-of join: composite keys partition the carry; tolerance nulls stale matches") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, "x", 100L), // matched by right@90 (within tol 50)
      (11L, 1L, "x", 200L), // latest right is @90 — staler than 200-50 → NULLs
      (12L, 1L, "y", 100L), // same id, different 2nd key: only y-rights count
      (13L, 2L, "x", 100L)  // no right at all → NULLs
    ).toDF("event_id", "k1", "k2", "ts")
    val right = Seq(
      (1L, "x", 90L, 9.0),
      (1L, "x", 40L, 4.0),
      (1L, "y", 95L, 5.0)
    ).toDF("k1", "k2", "ts", "v")
    val got = AsofJoin.lastAtOrBefore(left, right, Seq("k1", "k2"), "ts", toleranceUs = 50L)
      .select("event_id", "asof_ts", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    val want = Set(
      (10L, Some(90L), Some(9.0)),
      (11L, None, None),
      (12L, Some(95L), Some(5.0)),
      (13L, None, None))
    assert(got == want, s"got $got")
  }

  test("as-of join without tolerance keeps arbitrarily old matches") {
    import spark.implicits._
    val left = Seq((1L, 1L, 1000000L)).toDF("event_id", "k", "ts")
    val right = Seq((1L, 1L, 2.0)).toDF("k", "ts", "v")
    val got = AsofJoin.lastAtOrBefore(left, right, Seq("k"), "ts")
      .select("event_id", "asof_ts", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    assert(got == Seq((1L, Some(1L), Some(2.0))))
  }
}
