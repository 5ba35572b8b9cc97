package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native kernels for the logistic-regression margin folds of
  * [[graft.text.QualityClassifier]] — the engine's last hot per-row
  * higher-order-function lambdas (Spark HOF `aggregate` lambdas run as
  * CodegenFallback; the defect class the entropy/CDC/BM25/DSIR kernels
  * already fixed). The classifier family executes the margin fold R+1 = 7
  * times over the corpus per training row, so this was the single most
  * expensive interpreted site left in the engine.
  *
  * Both kernels carry the weight vector as ONE plan Literal
  * (array<double>, O(Buckets+1) = 257 entries), parsed once per plan and
  * embedded as a codegen reference object. The fold order and every IEEE
  * operation are IDENTICAL to the retired Column renderings (pinned by
  * spec), so all existing classifier oracles hold byte-for-byte:
  *
  *  - [[LrMarginFold]] replaces
  *    `aggregate(fx, 0.0, acc + element_at(w, b+1) * c.cast(double))` —
  *    the in-array-order fold over the pre-built feature structs
  *    (sorted buckets + trailing bias entry): acc ← acc + w[b]·(double)c.
  *  - [[LrPresenceMargin]] replaces the streaming-side
  *    `aggregate(sort(distinct(hash-buckets)), 0.0, acc + w[b+1]) + bias`
  *    dag: one tokenization, buckets via the portable md5 hash
  *    ([[Md5Prefix60]] ≡ `pmod(hash60(tok), B)`), ascending-bucket
  *    presence fold, bias added LAST (the documented bit-identity with
  *    the batch scorer's sorted-array-then-bias order).
  */
case class LrMarginFold(child: Expression, modelExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = modelExpr

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] && modelExpr.foldable &&
        modelExpr.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lr_margin_fold expects (array<struct<b,c>>, foldable array<double>), " +
        s"got (${child.dataType}, ${modelExpr.dataType})")

  @transient private lazy val parsed: Array[Double] =
    modelExpr.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(input: Any, m: Any): Any =
    LrMarginFold.compute(input.asInstanceOf[ArrayData], parsed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lrw", parsed, "double[]")
    defineCodeGen(ctx, ev, (c, _) =>
      s"graft.functions.expressions.LrMarginFold.compute($c, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(child = newLeft, modelExpr = newRight)
}

object LrMarginFold {
  def of(fx: org.apache.spark.sql.Column,
      model: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(LrMarginFold(
      org.apache.spark.sql.graft.Shim.expression(fx),
      org.apache.spark.sql.graft.Shim.expression(model)))

  /** acc ← acc + w[b]·(double)c over the structs IN ARRAY ORDER — the
    * exact IEEE sequence of the retired `aggregate` lambda (the ×c
    * multiply happens before the add, as the Column dag parenthesized).
    */
  def compute(fx: ArrayData, w: Array[Double]): Double = {
    var acc = 0.0
    val n = fx.numElements()
    var i = 0
    while (i < n) {
      val f = fx.getStruct(i, 2)
      acc += w(f.getLong(0).toInt) * f.getLong(1).toDouble
      i += 1
    }
    acc
  }
}

case class LrPresenceMargin(child: Expression, modelExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = modelExpr

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && modelExpr.foldable &&
        modelExpr.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lr_presence_margin expects (string, foldable array<double>), " +
        s"got (${child.dataType}, ${modelExpr.dataType})")

  @transient private lazy val parsed: Array[Double] =
    modelExpr.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(input: Any, m: Any): Any =
    LrPresenceMargin.compute(input.asInstanceOf[UTF8String], parsed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lrw", parsed, "double[]")
    defineCodeGen(ctx, ev, (c, _) =>
      s"graft.functions.expressions.LrPresenceMargin.compute($c, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(child = newLeft, modelExpr = newRight)
}

object LrPresenceMargin {
  def of(text: org.apache.spark.sql.Column,
      model: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(LrPresenceMargin(
      org.apache.spark.sql.graft.Shim.expression(text),
      org.apache.spark.sql.graft.Shim.expression(model)))

  /** One tokenization, presence bitmap over B = w.length−1 buckets
    * (bucket = portable 60-bit md5 hash mod B — positive, so `%` ≡
    * `pmod`), ascending-bucket fold (≡ `array_sort(array_distinct(…))`
    * then aggregate), bias w[B] added LAST — the exact IEEE add sequence
    * of the retired Column dag. */
  def compute(s: UTF8String, w: Array[Double]): Double = {
    val b = w.length - 1
    // a bias-only model (no feature slots) can't bucket anything: the
    // margin is the bias itself — guards the b = 0 modulus below
    if (b == 0) return w(0)
    val toks = TextKernels.tokenize(s)
    val present = new Array[Boolean](b)
    var i = 0
    while (i < toks.length) {
      present((Md5Prefix60.hash(toks(i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)) % b.toLong).toInt) = true
      i += 1
    }
    var acc = 0.0
    var j = 0
    while (j < b) {
      if (present(j)) acc += w(j)
      j += 1
    }
    acc + w(b)
  }
}
