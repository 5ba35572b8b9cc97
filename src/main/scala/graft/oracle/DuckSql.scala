package graft.oracle

/** DuckDB SQL fragments that are value-exact mirrors of
  * [[graft.functions.GraftFunctions]]. The driver's correctness gate runs
  * `SparkEntry.oracleSql` through DuckDB and hash-compares with the Spark
  * result, so each fragment here must produce bit-identical values to its
  * Spark twin:
  *   - integers/strings: trivially exact;
  *   - md5 hex: identical in both engines;
  *   - doubles: both sides do the same double ops in the same order
  *     (in-order left folds), so IEEE results are identical;
  *   - money aggregates: both sides sum in DECIMAL (exact, order-free) and
  *     cast the final value to DOUBLE.
  */
object DuckSql {

  /** 60-bit md5-prefix hash == GraftFunctions.hash60.
    * CAUTION: the rendering binds lambda variables `i`, `a`, `b`
    * internally — an `expr` referencing an OUTER lambda variable with
    * one of those names is silently captured by the inner binding
    * (measured: a CDC boundary filter over `i` chunked on hex-digit
    * positions instead of token positions). Name outer lambda variables
    * something else. */
  def hash60(expr: String): String =
    s"list_reduce(list_transform(range(1,16), i -> " +
      s"strpos('0123456789abcdef', substr(md5(CAST(($expr) AS VARCHAR)), CAST(i AS INT), 1)) - 1), " +
      s"(a,b) -> a*16+b)"

  def hash60Seeded(seed: Int, expr: String): String =
    hash60(s"'$seed' || ':' || CAST(($expr) AS VARCHAR)")

  /** Lowercased whitespace tokens, empties removed == GraftFunctions.tokens.
    * Uses the shared explicit whitespace class, not `\s`: RE2's `\s`
    * excludes `\x0B` while Java's includes it (r6 advice).
    */
  def tokens(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), " +
      s"'${graft.functions.GraftFunctions.WsClass}+'), t -> t <> '')"

  /** Distinct word n-gram shingles == GraftFunctions.wordShingles.
    * `t` must be a column name holding the token list (lambdas capture it).
    */
  def wordShingles(t: String, n: Int): String = {
    val gram = (0 until n).map(j => s"$t[CAST(i+${j + 1} AS INT)]").mkString(" || ' ' || ")
    s"CASE WHEN len($t) >= $n THEN list_distinct(" +
      s"list_transform(range(0, len($t) - ${n - 1}), i -> $gram)) " +
      s"ELSE CAST([] AS VARCHAR[]) END"
  }

  /** Exact in-order cosine == GraftFunctions.cosine. */
  private def fold(l: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $l), (acc, x) -> acc + x)"

  /** In-order dot product == GraftFunctions.dot (ArrayDotProduct's fold). */
  def ip(a: String, b: String): String =
    fold(s"list_transform(range(1, len($a)+1), i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * CAST($b[CAST(i AS INT)] AS DOUBLE))")

  /** In-order squared norm == GraftFunctions.dot(v, v). */
  def normSq(a: String): String =
    fold(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")

  def cosine(a: String, b: String): String =
    s"(${ip(a, b)}) / (sqrt(${normSq(a)}) * sqrt(${normSq(b)}))"
}
