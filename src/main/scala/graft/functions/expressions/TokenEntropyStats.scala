package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Single-pass kernel for the token-entropy quality signal
  * ([[graft.text.TextAnalysis.entropyColumns]]): one tokenization + one
  * hash-map count per row yields (n_tokens, n_types, ent_q). Value-
  * identical to the sorted-run `aggregate` fold it replaced — per TYPE
  * the quantized term is floor(10⁶·(c/n)·plog(c/n)) and the integer sum
  * is order-free, so counting via a map instead of sorted runs cannot
  * change the total — but the HOF fold ran as CodegenFallback with the
  * 16-sqrt portable-log dag interpreted per run boundary (measured
  * 42.7 s for the sf0.1 scan, the slowest row in the bench); the kernel
  * runs the same IEEE ops compiled, inside whole-stage codegen.
  * [[graft.functions.PortableLog.plog]] is the Scala rendering of the
  * exact dag the Column layer and the DuckDB oracle stage — one
  * definition, bit-equal everywhere.
  */
case class TokenEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenEntropyStats.Schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_entropy_stats expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TokenEntropyStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenEntropyStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenEntropyStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("ent_q", LongType, nullable = false)))

  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(
      TokenEntropyStats(org.apache.spark.sql.graft.Shim.expression(c)))

  def compute(s: UTF8String): InternalRow = {
    val toks = TextKernels.tokenize(s)
    val n = toks.length.toLong
    if (n == 0L) return InternalRow(0L, 0L, 0L)
    val counts = TextKernels.countTokens(toks)
    // per-TYPE quantized terms summed as integers — order-free, so the
    // map's iteration order is immaterial (the property that also lets
    // the oracle take the grouped-counts route)
    val nD = n.toDouble
    var entQ = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val x = it.next().longValue.toDouble / nD
      entQ += math.floor(1.0e6 * (x * graft.functions.PortableLog.plog(x))).toLong
    }
    InternalRow(n, counts.size.toLong, entQ)
  }
}
