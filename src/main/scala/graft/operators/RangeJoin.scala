package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) self-join: all pairs whose integral value columns differ
  * by less than `width`.
  *
  * A pure range predicate has no equi-key, so Spark plans the naive
  * `a JOIN b ON abs(a.v − b.v) < w` as a broadcast-nested-loop or
  * cartesian product — O(n²) work regardless of how few pairs survive.
  * The scale plan is the bucketize-and-probe pattern (the same idea as
  * the reference's key-partitioned interval join,
  * /root/reference/wf/interval_join.hpp, applied to a value axis):
  *
  *   1. bucket = v div width. Two values less than `width` apart sit in
  *      the same or adjacent buckets — never further;
  *   2. one side keeps its bucket, the other explodes to
  *      {bucket−1, bucket, bucket+1};
  *   3. equi-join on the bucket (ordinary shuffle hash/sort-merge join),
  *      then the exact |a.v − b.v| < width filter.
  *
  * Each qualifying pair matches on exactly one of the three probe
  * buckets (bucket difference is unique), so no dedup pass is needed.
  * Work becomes O(n · density) — the 3× probe multiplier replaces the n²
  * blowup, and the join shuffles only (id, value, bucket) triples.
  *
  * The value column must be integral (quantize money to cents first, as
  * the engine does everywhere): bucket math and the band predicate stay
  * exact, with none of the float boundary cases where `v/width` rounds
  * across a bucket edge.
  */
object RangeJoin {

  /** Self-join pairs (a_id < b_id) with |a.v − b.v| < width. Output:
    * a_id, b_id, a_<v>, b_<v>. Values may be negative: buckets use FLOOR
    * division (`(v − pmod(v, w)) div w`, exact integer math) — truncating
    * `div` would put −1 and 1 in the same bucket 0 while splitting −3/−1,
    * silently dropping qualifying negative pairs.
    */
  def bandSelfJoin(df: DataFrame, idCol: String, vCol: String, width: Long): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    val bkt = expr(s"(CAST($vCol AS BIGINT) - pmod(CAST($vCol AS BIGINT), $width)) div $width")
    val a = df.select(col(idCol).as("a_id"), col(vCol).as(s"a_$vCol"),
      bkt.as("__b"))
    val b = df.select(col(idCol).as("b_id"), col(vCol).as(s"b_$vCol"),
      explode(array(bkt - 1, bkt, bkt + 1)).as("__b"))
    a.join(b, Seq("__b"))
      .filter(col("a_id") < col("b_id") &&
        abs(col(s"a_$vCol") - col(s"b_$vCol")) < width)
      .drop("__b")
  }
}
