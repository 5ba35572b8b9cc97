package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-based window aggregation over int64-µs event time, batch surface.
  *
  * Two physically different plans with identical results (the reference's
  * Keyed_Windows vs Paned_Windows, SURVEY §2.4):
  *
  *  - [[sliding]] — assign each row its len/slide window ids (explode) and
  *    hash-aggregate. Simple; the pre-shuffle multiplier is len/slide.
  *  - [[slidingByPanes]] — the reference's pane decomposition
  *    (/root/reference/wf/paned_windows.hpp:140-141): tumbling panes of
  *    g = gcd(len, slide) are aggregated first (PLQ — map-side partial,
  *    tiny output), then len/g pane-partials combine per window (WLQ).
  *    At 100 TB the explode multiplier moves from per-row to per-pane,
  *    which is the difference between shuffling N·len/slide rows and
  *    shuffling (#panes)·len/g pane summaries.
  *
  * Aggregates must be decomposable (count/sum/min/max); value sums fold in
  * integer cents so both plans are bit-identical.
  */
object TimeWindows {

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Exact int64 FLOOR division as SQL text. SQL `div` truncates toward
    * zero, so a raw `ts div g` anchor diverges from the streaming twins'
    * `Math.floorDiv` for event times before the epoch (r6 advice);
    * `x - pmod(x, d)` is the largest multiple of d ≤ x, making this
    * floorDiv for every x including negatives, with no double round-trip.
    */
  private def fdiv(x: String, d: Long): String =
    s"((($x) - pmod(($x), ${d}L)) div ${d}L)"

  /** Direct per-row window assignment. Output: keys ++ (win_start_us, cnt,
    * sum_cents).
    */
  def sliding(df: DataFrame, tsUsCol: String, valueCentsCol: String,
      lenUs: Long, slideUs: Long, keys: Seq[String]): DataFrame =
    df.withColumn("__w", explode(expr(
        s"CASE WHEN ${fdiv(s"$tsUsCol - $lenUs", slideUs)} + 1 <= ${fdiv(tsUsCol, slideUs)} " +
          s"THEN sequence(${fdiv(s"$tsUsCol - $lenUs", slideUs)} + 1, ${fdiv(tsUsCol, slideUs)}) END")))
      .groupBy(keys.map(col) :+ expr(s"__w * $slideUs").as("win_start_us"): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCentsCol)).as("sum_cents"))

  /** Pane-decomposed variant (PLQ/WLQ). Result-identical to [[sliding]]. */
  def slidingByPanes(df: DataFrame, tsUsCol: String, valueCentsCol: String,
      lenUs: Long, slideUs: Long, keys: Seq[String]): DataFrame = {
    val g = gcd(lenUs, slideUs)
    val panes = df
      .groupBy(keys.map(col) :+ expr(s"$tsUsCol - pmod($tsUsCol, ${g}L)").as("__pane"): _*)
      .agg(count(lit(1)).as("__pcnt"), sum(col(valueCentsCol)).as("__psum"))
    panes
      .withColumn("__w", explode(expr(
        s"CASE WHEN ${fdiv(s"__pane - $lenUs", slideUs)} + 1 <= ${fdiv("__pane", slideUs)} " +
          s"THEN sequence(${fdiv(s"__pane - $lenUs", slideUs)} + 1, ${fdiv("__pane", slideUs)}) END")))
      .groupBy(keys.map(col) :+ expr(s"__w * $slideUs").as("win_start_us"): _*)
      .agg(sum(col("__pcnt")).as("cnt"), sum(col("__psum")).as("sum_cents"))
  }

  /** FlatFAT variant ([[FlatFatWindows]], the reference's Ffat_Windows):
    * rows shuffle ONCE on the group key (no pre-shuffle explode
    * multiplier), all windows per group derive from O(log n) range
    * combines over the flat aggregation tree — including the
    * non-invertible min/max. Output: keys ++ (win_start_us, cnt,
    * sum_cents, min_cents, max_cents).
    */
  def slidingByFlatFat(df: DataFrame, tsUsCol: String, valueCentsCol: String,
      lenUs: Long, slideUs: Long, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(FlatFatWindows(col(tsUsCol), col(valueCentsCol), lenUs, slideUs).as("__wins"))
      .select(keys.map(col) :+ explode(col("__wins")).as("__w"): _*)
      .select(keys.map(col) :+ col("__w.win_start_us").as("win_start_us") :+
        col("__w.cnt").as("cnt") :+ col("__w.sum_cents").as("sum_cents") :+
        col("__w.min_cents").as("min_cents") :+ col("__w.max_cents").as("max_cents"): _*)

  /** Pane-fed FlatFAT (PLQ panes → WLQ tree): the pane decomposition of
    * [[slidingByPanes]] applied to the FlatFAT plan of [[slidingByFlatFat]].
    * Rows pre-aggregate per gcd(len, slide) tumbling pane — a partial→final
    * HashAggregate, so the wide shuffle moves only map-side-combined pane
    * summaries, never raw rows — and the per-key FlatFAT tree then holds one
    * leaf per PANE instead of one per row
    * (/root/reference/wf/paned_windows.hpp:140-141). Valid because panes
    * align with window boundaries (g divides both len and slide, so a pane
    * is entirely inside or outside every window) and (cnt, sum, min, max)
    * is associative. Result-identical to [[slidingByFlatFat]] (spec), with
    * the few-distinct-keys hot-key cost moved from O(rows per key) to
    * O(panes per key). Same output columns.
    */
  def slidingByFlatFatPaned(df: DataFrame, tsUsCol: String, valueCentsCol: String,
      lenUs: Long, slideUs: Long, keys: Seq[String]): DataFrame = {
    val g = gcd(lenUs, slideUs)
    val panes = df
      .groupBy(keys.map(col) :+ expr(s"$tsUsCol - pmod($tsUsCol, ${g}L)").as("__pane"): _*)
      .agg(count(col(valueCentsCol)).as("__pcnt"), sum(col(valueCentsCol)).as("__psum"),
        min(col(valueCentsCol)).as("__pmin"), max(col(valueCentsCol)).as("__pmax"))
    panes.groupBy(keys.map(col): _*)
      .agg(FlatFatWindows.fromPartials(col("__pane"), col("__pcnt"), col("__psum"),
        col("__pmin"), col("__pmax"), lenUs, slideUs).as("__wins"))
      .select(keys.map(col) :+ explode(col("__wins")).as("__w"): _*)
      .select(keys.map(col) :+ col("__w.win_start_us").as("win_start_us") :+
        col("__w.cnt").as("cnt") :+ col("__w.sum_cents").as("sum_cents") :+
        col("__w.min_cents").as("min_cents") :+ col("__w.max_cents").as("max_cents"): _*)
  }
}
