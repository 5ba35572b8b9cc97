package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Single-pass kernel for DSIR scoring ([[graft.text.Dsir.score]]): per
  * document ONE tokenization, then every unigram and every bigram hashed
  * once ([[Md5Prefix60]] — the engine's portable 60-bit hash, so the
  * value is exactly the Column rendering's `pmod(hash60(gram), B)`
  * bucket) and its quantized log-ratio summed from the model array as an
  * exact integer add. Emits struct(n_grams, dsir_score); n_grams counts
  * unigrams + bigrams with multiplicity (2n−1 for n ≥ 1 tokens — the
  * `size(concat(tokens, bigrams))` of the composable rendering).
  *
  * Replaces the `aggregate(grams, 0L, acc + element_at(qlr, bucket+1))`
  * higher-order fold — the last hot per-row HOF lambda in the engine
  * (Spark HOFs run as CodegenFallback; the same defect class the
  * entropy/CDC/BM25 kernels fixed). The model rides as ONE plan Literal
  * (array<long>, O(Buckets) = 1024 entries), parsed once per plan and
  * embedded as a codegen reference object; byte-identical outputs, so
  * every DSIR oracle is unchanged.
  */
case class DsirScore(child: Expression, modelExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = modelExpr

  override def dataType: DataType = DsirScore.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && modelExpr.foldable &&
        modelExpr.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dsir_score expects (string, foldable array<bigint> model), got ${child.dataType}")

  @transient private lazy val parsed: Array[Long] =
    modelExpr.eval(null).asInstanceOf[ArrayData].toLongArray()

  override protected def nullSafeEval(input: Any, m: Any): Any =
    DsirScore.compute(input.asInstanceOf[UTF8String], parsed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirqlr", parsed, "long[]")
    defineCodeGen(ctx, ev, (c, _) =>
      s"graft.functions.expressions.DsirScore.compute($c, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(child = newLeft, modelExpr = newRight)
}

object DsirScore {
  val Schema: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("dsir_score", LongType, nullable = false)))

  def of(text: org.apache.spark.sql.Column,
      model: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(DsirScore(
      org.apache.spark.sql.graft.Shim.expression(text),
      org.apache.spark.sql.graft.Shim.expression(model)))

  def compute(s: UTF8String, qlr: Array[Long]): InternalRow = {
    val b = qlr.length.toLong
    val toks = TextKernels.tokenize(s)
    val n = toks.length
    var score = 0L
    var i = 0
    while (i < n) {
      score += qlr((Md5Prefix60.hash(toks(i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)) % b).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      // the bigram string exactly as wordGramsFromTokens renders it —
      // single-space joined — so the md5 bucket matches the oracle's
      score += qlr((Md5Prefix60.hash((toks(i) + " " + toks(i + 1))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)) % b).toInt)
      i += 1
    }
    InternalRow(if (n == 0) 0L else 2L * n - 1L, score)
  }
}
