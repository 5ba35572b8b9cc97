package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TimeWindows

/** Physical window schemes are result-identical (the reference's
  * Keyed/Paned/MapReduce window operators compute one logical result —
  * SURVEY §2.4).
  */
class WindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pane-decomposed sliding windows == direct sliding windows") {
    val ev = Tables.events(spark, TestSpark.SF)
      .select(col("event_type"), expr("ts div 1000").as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val len = 3600000000L; val slide = 900000000L
    val direct = TimeWindows.sliding(ev, "ts_us", "cents", len, slide, Seq("event_type"))
    val paned = TimeWindows.slidingByPanes(ev, "ts_us", "cents", len, slide, Seq("event_type"))
    val d = direct.collect().map(_.toString).sorted
    val p = paned.collect().map(_.toString).sorted
    assert(d.sameElements(p))
    assert(d.nonEmpty)
  }

  test("FlatFAT sliding windows == direct sliding windows (incl. min/max)") {
    val ev = Tables.events(spark, TestSpark.SF)
      .select(col("event_type"), expr("ts div 1000").as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    for ((len, slide) <- Seq((3600000000L, 900000000L),   // sliding
                             (600000000L, 1800000000L))) { // hopping w/ gaps
      val direct = TimeWindows.sliding(ev, "ts_us", "cents", len, slide, Seq("event_type"))
        .join(ev.withColumn("w", explode(expr(
            s"CASE WHEN (ts_us - $len) div $slide + 1 <= ts_us div $slide " +
              s"THEN sequence((ts_us - $len) div $slide + 1, ts_us div $slide) END")))
          .groupBy(col("event_type"), expr(s"w * $slide").as("win_start_us"))
          .agg(min("cents").as("min_cents"), max("cents").as("max_cents")),
          Seq("event_type", "win_start_us"))
      val ffat = TimeWindows.slidingByFlatFat(ev, "ts_us", "cents", len, slide, Seq("event_type"))
      val d = direct.select("event_type", "win_start_us", "cnt", "sum_cents", "min_cents", "max_cents")
        .collect().map(_.toString).sorted
      val f = ffat.collect().map(_.toString).sorted
      assert(d.nonEmpty && d.sameElements(f), s"mismatch for len=$len slide=$slide")
      // pane-fed FlatFAT (PLQ gcd-pane partials → WLQ tree) is the same
      // logical result again — one leaf per pane instead of per row
      val paned = TimeWindows.slidingByFlatFatPaned(ev, "ts_us", "cents", len, slide, Seq("event_type"))
        .collect().map(_.toString).sorted
      assert(d.sameElements(paned), s"pane-fed ffat mismatch for len=$len slide=$slide")
    }
  }

  test("distributed prefix scan equals the single-partition window") {
    val ev = Tables.events(spark, TestSpark.SF)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        expr("CAST(round(value*100) AS BIGINT)").as("cents"))
    val scalable = graft.operators.PrefixSum.runningSum(ev, "cents", Seq("ts_us", "event_id"), 7)
      .select("event_id", "running_cents").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = ev.withColumn("r", sum("cents").over(w))
      .select("event_id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scalable == naive)
  }

  test("multi-column prefix scan equals per-column runningSum") {
    val ev = Tables.events(spark, TestSpark.SF)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        expr("CAST(round(value*100) AS BIGINT)").as("cents"))
      .withColumn("ones", lit(1L))
    val multi = graft.operators.PrefixSum.runningSums(
        ev, Seq("cents", "ones"), Seq("ts_us", "event_id"), 7)
      .select("event_id", "running_cents", "running_ones").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val single = graft.operators.PrefixSum.runningSum(
        ev, "cents", Seq("ts_us", "event_id"), 5)
      .select("event_id", "running_cents").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ones = graft.operators.PrefixSum.runningSum(
        ev, "ones", Seq("ts_us", "event_id"), 3)
      .select("event_id", "running_ones").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi.map { case (k, v) => k -> v._1 } == single)
    assert(multi.map { case (k, v) => k -> v._2 } == ones)
    Caches.releaseAll()
  }

  test("partition running sum keeps window-sum null semantics (r17 narrow kernel)") {
    // within a partition: leading nulls yield null (no value seen yet); a
    // later null neither resets nor emits null — byte-for-byte the ROWS
    // UNBOUNDED PRECEDING window-sum contract the stateful kernel
    // replaced. (numPartitions=1 so partition semantics == global window;
    // at partition BOUNDARIES a leading-null row sums null + offset =
    // null — the window path behaved identically, and every declared
    // caller feeds non-null value columns.)
    val df = spark.sql(
      """SELECT * FROM VALUES (1L, CAST(NULL AS BIGINT)), (2L, CAST(NULL AS BIGINT)),
        | (3L, 5L), (4L, CAST(NULL AS BIGINT)), (5L, 7L) AS t(id, v)""".stripMargin)
    val got = graft.operators.PrefixSum.runningSum(df, "v", Seq("id"), 1)
      .select("id", "running_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> Some(5L), 4L -> Some(5L), 5L -> Some(12L)))
    Caches.releaseAll()
  }

  test("hopping windows (len < slide) drop gap rows") {
    val ev = Tables.events(spark, TestSpark.SF)
      .select(expr("ts div 1000").as("ts_us"), expr("CAST(round(value*100) AS BIGINT)").as("cents"))
    val total = ev.count()
    val hop = TimeWindows.sliding(ev, "ts_us", "cents", 600000000L, 1800000000L, Seq.empty)
    val inWindows = hop.agg(sum("cnt")).collect()(0).getLong(0)
    assert(inWindows < total, "hopping with gaps must not cover every row")
    assert(inWindows > 0)
  }
}
