package graft.functions.expressions

import org.apache.spark.unsafe.types.UTF8String

/** The parity-critical primitives shared by the native text kernels
  * ([[RepetitionStats]], [[GopherStats]]): tokenization, line split and
  * codepoint counting. Defined ONCE because each must stay value-
  * identical to its Column-layer and DuckDB twins for the oracle gate to
  * be bit-equal — [[graft.functions.GraftFunctions.tokens]] /
  * `DuckSql.tokens` (lowercased explicit-whitespace split, empties
  * removed), `split(text, '\n')` with trailing empties kept, and both
  * engines' codepoint `length()`.
  */
private[expressions] object TextKernels {

  /** Shared explicit whitespace class (not `\s` — Java/RE2 divergence on
    * `\x0B`), precompiled once per JVM instead of per row.
    */
  private val Ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(graft.functions.GraftFunctions.WsClass + "+")

  /** Lowercased whitespace tokens, empties removed. */
  def tokenize(s: UTF8String): Array[String] =
    Ws.split(s.toLowerCase.toString, -1).filter(_.nonEmpty)

  /** Raw lines, trailing empties kept (split limit -1 on both engines). */
  def lines(raw: String): Array[String] = raw.split("\n", -1)

  /** Token→count map over [[tokenize]]'s output — the shared first step
    * of the per-row counting kernels ([[TokenEntropyStats]],
    * [[Bm25Scores]]). */
  def countTokens(toks: Array[String]): java.util.HashMap[String, java.lang.Long] = {
    val counts = new java.util.HashMap[String, java.lang.Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val c = counts.get(t)
      counts.put(t, if (c == null) 1L else c.longValue + 1L)
      i += 1
    }
    counts
  }

  /** Unicode codepoint count == Spark/DuckDB `length()`. */
  def cp(x: String): Long = x.codePointCount(0, x.length).toLong
}
