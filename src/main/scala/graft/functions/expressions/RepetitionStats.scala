package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition-statistics kernel: tokenizes once (lowercased
  * whitespace split, empties removed — value-identical to
  * [[graft.functions.GraftFunctions.tokens]] and the DuckDB oracle) and
  * computes in one loop the integer counts behind the Gopher/C4 repetition
  * filters: token count, word 2-/3-gram totals and distinct counts, and
  * the most-frequent-token count.
  *
  * Value-identical to the composable higher-order-function rendering
  * (`wordGrams` + `array_distinct` + an `aggregate` run-length fold over
  * `sort_array`), but that tree evaluates the tokenization per derived
  * column and every HOF is CodegenFallback — measured ~7 s for the
  * sf0.1 documents scan vs sub-second here. Ratios stay in the Column
  * layer (single divisions of these exact integers), so the oracle is
  * unchanged.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.Schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("g2_total", LongType, nullable = false),
    StructField("g2_distinct", LongType, nullable = false),
    StructField("g3_total", LongType, nullable = false),
    StructField("g3_distinct", LongType, nullable = false),
    StructField("top_token", LongType, nullable = false),
    // line-level signals (Gopher's dup_line/dup_line_char fractions):
    // lines split on '\n' over the RAW text (no lowercasing — exact-line
    // duplication is case-sensitive), lengths in Unicode codepoints to
    // match Spark/DuckDB length()
    StructField("n_lines", LongType, nullable = false),
    StructField("line_distinct", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false)))

  /** One tokenization, one pass per gram width, one frequency map per
    * granularity (token, line). Tokenization/line/codepoint primitives
    * come from [[TextKernels]] — the one definition every native text
    * kernel and oracle twin must agree with.
    */
  def compute(s: UTF8String): InternalRow = {
    val raw = s.toString
    import TextKernels.cp
    // line stats over the raw text (case-sensitive, codepoint lengths)
    val lns = TextKernels.lines(raw)
    val lfreq = new java.util.HashMap[String, Long]()
    var lineChars = 0L
    lns.foreach { l => lfreq.merge(l, 1L, (a, b) => a + b); lineChars += cp(l) }
    var dupLineChars = 0L
    lfreq.forEach((l, c) => if (c > 1) dupLineChars += (c - 1) * cp(l))
    val nLines = lns.length.toLong
    val lDistinct = lfreq.size.toLong

    val toks = TextKernels.tokenize(s)
    val m = toks.length
    if (m == 0) return InternalRow(0L, 0L, 0L, 0L, 0L, 0L,
      nLines, lDistinct, dupLineChars, lineChars)
    val freq = new java.util.HashMap[String, Long]()
    var top = 0L
    var i = 0
    while (i < m) {
      val c = freq.merge(toks(i), 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    def distinctGrams(n: Int): Long = {
      if (m < n) return 0L
      val seen = new java.util.HashSet[String]()
      var j = 0
      while (j <= m - n) {
        val sb = new java.lang.StringBuilder(toks(j))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(j + k)); k += 1 }
        seen.add(sb.toString)
        j += 1
      }
      seen.size.toLong
    }
    val g2t = math.max(0, m - 1).toLong
    val g3t = math.max(0, m - 2).toLong
    InternalRow(m.toLong, g2t, distinctGrams(2), g3t, distinctGrams(3), top,
      nLines, lDistinct, dupLineChars, lineChars)
  }

  def of(c: Column): Column = Shim.column(RepetitionStats(Shim.expression(c)))
}
