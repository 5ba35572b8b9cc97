package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Single-pass kernel for the structural Gopher rule-set counters
  * ([[graft.text.TextAnalysis.gopherColumns]]): one tokenization + one
  * line split per row yields every integer behind the symbol/bullet/
  * ellipsis/alpha/stopword signals. Value-identical to the composable
  * HOF rendering (split + filter lambdas + three regexp passes), which
  * re-evaluates the tokenization/line split per derived column and runs
  * every HOF as CodegenFallback — the same cost profile the
  * [[RepetitionStats]] kernel replaced (~7 s → sub-second on the sf0.1
  * scan). Ratios stay in the Column layer as single divisions of these
  * exact integers, so the DuckDB oracle is unchanged.
  *
  * Parity notes (each counter must equal its SQL twin bit-for-bit):
  *  - `n_ell3` counts leftmost NON-OVERLAPPING "..." (regexp_replace
  *    semantics on both engines): scan with indexOf, step 3 on match;
  *  - `n_alpha` uses Character.isLetter (Unicode categories Lu/Ll/Lt/
  *    Lm/Lo) == Java-regex and RE2 `\p{L}`;
  *  - char counts are Unicode codepoints, matching both engines'
  *    `length()`.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStats.Schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.GopherStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("tok_chars", LongType, nullable = false), // Σ codepoints over tokens
    StructField("n_hash", LongType, nullable = false),     // '#'
    StructField("n_ellipsis", LongType, nullable = false), // "..." + '…'
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ellline", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  /** Gopher's 8 required stopwords, in list order — the canonical list
    * the oracle SQL is also generated from.
    */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def compute(s: UTF8String): InternalRow = {
    val raw = s.toString
    import TextKernels.cp

    // symbol occurrences over the raw text, counted PER SYMBOL — the
    // paper's rule thresholds the hash ratio and the ellipsis ratio
    // separately ("either the hash symbol or the ellipsis"): '#',
    // non-overlapping "...", '…' (single BMP char)
    var nHash = 0L
    var nEllU = 0L
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '#') nHash += 1
      else if (c == '…') nEllU += 1
      i += 1
    }
    var nEll3 = 0L
    var from = raw.indexOf("...")
    while (from >= 0) { nEll3 += 1; from = raw.indexOf("...", from + 3) }

    // line structure over the raw text
    val lns = TextKernels.lines(raw)
    var nBullet = 0L
    var nEllLine = 0L
    lns.foreach { l =>
      if (l.startsWith("•") || l.startsWith("- ") || l.startsWith("* "))
        nBullet += 1
      if (l.endsWith("...") || l.endsWith("…")) nEllLine += 1
    }

    val toks = TextKernels.tokenize(s)
    var tokChars = 0L
    var nAlpha = 0L
    val stopSeen = new java.util.HashSet[String]()
    toks.foreach { t =>
      tokChars += cp(t)
      var j = 0
      var hasLetter = false
      while (j < t.length && !hasLetter) {
        val cpv = t.codePointAt(j)
        if (Character.isLetter(cpv)) hasLetter = true
        j += Character.charCount(cpv)
      }
      if (hasLetter) nAlpha += 1
      if (RequiredStopwords.contains(t)) stopSeen.add(t): Unit
    }
    InternalRow(toks.length.toLong, tokChars, nHash, nEll3 + nEllU,
      lns.length.toLong, nBullet, nEllLine, nAlpha, stopSeen.size.toLong)
  }

  def of(c: Column): Column = Shim.column(GopherStats(Shim.expression(c)))
}
