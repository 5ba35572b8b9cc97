package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single latest right row with
  * `right.ts <= left.ts` on the same key (ties at equal ts match).
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
  *   2. one hash shuffle on the key, each partition sorted by
  *      (ts, __side) — rights sort before lefts at equal ts, making the
  *      at-or-before rule a pure prefix property;
  *   3. every right payload column is carried forward with
  *      `last(col, ignoreNulls) over (key order ts,__side rows
  *      unbounded preceding..current)`, so each left row reads the most
  *      recent right values in O(1) per row;
  *   4. keep the left rows.
  *
  * One Exchange, no join node, no hash table, linear per partition
  * (plan-asserted in PlanQualitySpec). At 100 TB both sides move once;
  * skew handling is the same story as any keyed shuffle (AQE/salting).
  *
  * Contract: the right side must be unique per (key, ts) — pre-aggregate
  * duplicates first (any exact aggregate), or the carried values are
  * order-dependent. A right payload that is genuinely NULL is
  * indistinguishable from "absent" and carries the previous non-null
  * value; model optional payloads with a sentinel if that matters.
  */
object AsofJoin {

  /** Left-outer as-of join. Output: all left columns, plus `asof_<ts>`
    * (the matched right row's timestamp) and `asof_<c>` for every other
    * right column — NULL where the left row precedes every right row.
    */
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame = {
    val rPayload = right.columns.filterNot(c => c == key || c == ts).toSeq
    val lOnly = left.columns.filterNot(c => c == key || c == ts).toSeq
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

    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(all)(
      (d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    val renamed = carried.zip(ts +: rPayload).foldLeft(filled.filter(col("__side") === 1)) {
      case (d, (alias, src)) => d.withColumnRenamed(alias, s"asof_$src")
    }
    renamed.drop("__side")
  }
}
