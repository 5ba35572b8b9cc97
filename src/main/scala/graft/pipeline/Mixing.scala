package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data MIXING: resample each corpus source at a configured
  * weight — the standard pretraining step (upweight curated sources,
  * downsample crawl) between cleaning and shard assembly.
  *
  * A weight w means each document yields floor(w) guaranteed copies plus
  * one more with probability frac(w), decided by the same fixed
  * multiplicative hash as the stratified sampler (`(id mod 2³¹) ·
  * 2654435761 mod 2³¹`, overflow-safe in int64) — deterministic across
  * runs, partitionings and engines, no RNG state to checkpoint. The
  * expected output size per source is exactly w × its corpus share.
  *
  * Scale shape: pure per-row column work + a row-explode — no shuffle, no
  * join, whole-stage codegen; at 100 TB the mixing step costs one scan.
  * Fractional thresholds quantize to integer `floor(frac(w) · 2³¹)` so
  * the keep decision is an exact int64 comparison on both engines.
  */
object Mixing {

  val HashMod: Long = 2147483648L // 2^31

  /** (whole copies, fractional-part int threshold) for a weight. */
  def weightParts(w: Double): (Long, Long) = {
    require(w >= 0, s"negative mix weight $w")
    val whole = w.toLong
    (whole, ((w - whole) * HashMod).toLong)
  }

  /** The deterministic per-document hash in [0, 2³¹). Well-defined for
    * NEGATIVE ids too: `pmod` is always non-negative, so the inner
    * reduction lands in [0, 2³¹) before the multiply (which then stays
    * exact in int64). Oracle replays must use [[duckMixHash]], not a
    * plain `%` chain — SQL `%` takes the dividend's sign, so the two
    * engines would disagree on the draw for id < 0.
    */
  def mixHash(idCol: String): Column =
    expr(s"pmod(pmod($idCol, $HashMod) * 2654435761, $HashMod)")

  /** The DuckDB rendering of [[mixHash]], sign-exact for any int64 id:
    * the inner `((id % M) + M) % M` reproduces `pmod(id, M)` (plain `%`
    * keeps the dividend's sign), after which the dividend of the outer
    * `%` is non-negative so it equals `pmod` verbatim.
    */
  def duckMixHash(idCol: String): String =
    s"(((($idCol % $HashMod) + $HashMod) % $HashMod) * 2654435761) % $HashMod"

  /** Output: input columns + `copy` (1..n for a document emitted n times).
    * Documents from sources with an effective 0-copy draw are dropped.
    */
  def sourceMix(df: DataFrame, idCol: String, srcCol: String,
      weights: Seq[(String, Double)], defaultWeight: Double): DataFrame = {
    val (defWhole, defThr) = weightParts(defaultWeight)
    val whole = weights.foldLeft(lit(defWhole)) { case (acc, (s, w)) =>
      when(col(srcCol) === s, lit(weightParts(w)._1)).otherwise(acc)
    }
    val thr = weights.foldLeft(lit(defThr)) { case (acc, (s, w)) =>
      when(col(srcCol) === s, lit(weightParts(w)._2)).otherwise(acc)
    }
    val copies = (whole + when(mixHash(idCol) < thr, 1L).otherwise(0L)).as("__copies")
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** The DuckDB rendering of the same decision, from the SAME weight
    * table (constants match by construction): `(whole-CASE, thr-CASE)`
    * SQL fragments over `srcCol`.
    */
  def duckCases(srcCol: String, weights: Seq[(String, Double)],
      defaultWeight: Double): (String, String) = {
    val (defWhole, defThr) = weightParts(defaultWeight)
    def cases(f: ((String, Double)) => Long, dflt: Long) =
      if (weights.isEmpty) dflt.toString // a WHEN-less CASE is a parse error
      else weights.map { case (s, w) => s"WHEN '$s' THEN ${f((s, w))}" }
        .mkString(s"CASE $srcCol ", " ", s" ELSE $dflt END")
    (cases(p => weightParts(p._2)._1, defWhole),
      cases(p => weightParts(p._2)._2, defThr))
  }
}
