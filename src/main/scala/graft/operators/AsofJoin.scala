package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single latest right row with
  * `right.ts <= left.ts` on the same key (ties at equal ts match),
  * optionally no older than `left.ts − tolerance` (max-lookback).
  *
  * The reference's closest operator is the symmetric Interval_Join
  * (/root/reference/wf/interval_join.hpp) — as-of is the asymmetric
  * "latest quote for each trade" flavor the reference leaves to user
  * code; it is a first-class operator here (beyond-reference, SURVEY
  * §8.8 spirit) because training-data and feature pipelines use it
  * constantly (latest label/feature snapshot at example time).
  *
  * Spark has no native as-of join, and the naive rendering —
  * `a JOIN b ON a.k = b.k AND b.ts <= a.ts` + max-per-group — plans a
  * many-to-many range join that explodes quadratically per hot key.
  * This implementation never builds a join at all:
  *
  *   1. union both sides into one frame, right rows tagged __side=0,
  *      left rows __side=1;
  *   2. one hash shuffle on the key columns, each partition sorted by
  *      (ts, __side) — rights sort before lefts at equal ts, making the
  *      at-or-before rule a pure prefix property;
  *   3. every right payload column is carried forward with
  *      `last(col, ignoreNulls) over (key order ts,__side rows
  *      unbounded preceding..current)`, so each left row reads the most
  *      recent right values in O(1) per row;
  *   4. keep the left rows; with a tolerance, null out carries whose
  *      matched ts precedes `left.ts − tolerance` (a pure per-row
  *      predicate over the carried ts — the carry is still the latest
  *      at-or-before row, merely disqualified when too stale).
  *
  * One Exchange, no join node, no hash table, linear per partition
  * (plan-asserted in PlanQualitySpec). At 100 TB both sides move once;
  * skew handling is the same story as any keyed shuffle (AQE/salting).
  *
  * Contract: the right side must be unique per (keys, ts) — pre-aggregate
  * duplicates first (any exact aggregate), or the carried values are
  * order-dependent. A right payload that is genuinely NULL is
  * indistinguishable from "absent" and carries the previous non-null
  * value; model optional payloads with a sentinel if that matters.
  */
object AsofJoin {

  /** Single-key, unbounded-lookback form (the common call). */
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame =
    lastAtOrBefore(left, right, Seq(key), ts)

  /** Left-outer as-of join on composite `keys`, with optional max-lookback.
    * Output: all left columns, plus `asof_<ts>` (the matched right row's
    * timestamp) and `asof_<c>` for every other right column — NULL where
    * the left row precedes every right row, or (when `toleranceUs >= 0`)
    * where the latest at-or-before right is older than `ts − toleranceUs`.
    */
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String, toleranceUs: Long = -1L): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
    val lOnly = left.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
    val carried = s"__r_$ts" +: rPayload.map(c => s"__r_$c")

    val lSide = carried.zip(ts +: rPayload).foldLeft(left.withColumn("__side", lit(1))) {
      case (d, (alias, src)) => d.withColumn(alias, lit(null).cast(right.schema(src).dataType))
    }
    val rSide0 = right
      .withColumn("__side", lit(0))
      .withColumn(s"__r_$ts", col(ts))
    val rSide1 = rPayload.foldLeft(rSide0)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val rSide = lOnly.foldLeft(rSide1)(
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = lSide.columns.map(col).toSeq
    val all = lSide.unionByName(rSide.select(cols: _*))

    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(all)(
      (d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    val lefts = filled.filter(col("__side") === 1)
    val bounded =
      if (toleranceUs < 0L) lefts
      else {
        val inRange = col(s"__r_$ts") >= col(ts) - toleranceUs
        carried.foldLeft(lefts)((d, c) => d.withColumn(c, when(inRange, col(c))))
      }

    val renamed = carried.zip(ts +: rPayload).foldLeft(bounded) {
      case (d, (alias, src)) => d.withColumnRenamed(alias, s"asof_$src")
    }
    renamed.drop("__side")
  }
}
