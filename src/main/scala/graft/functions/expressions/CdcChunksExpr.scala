package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Single-pass kernel for content-defined chunking
  * ([[graft.pipeline.Chunking.cdcChunks]]): one tokenization + one walk
  * per row — each token's 60-bit md5 hash decides the boundary class
  * (h mod mask = 0, the same [[Md5Prefix60]] value the Column layer and
  * DuckDB render), chunks close at boundaries, the residual tail closes
  * at end-of-doc. Value-identical to the composable HOF rendering
  * (boundary filter over token indexes + zip_with spans + slice per
  * chunk), which ran every lambda as CodegenFallback with the hash
  * interpreted per token (measured 14.2 s for the sf0.1 scan); the
  * kernel hashes the same bytes compiled. Output: array of
  * (chunk_len, chunk_text) structs in document order — empty docs yield
  * an empty array, a boundary on the last token opens no empty tail.
  */
case class CdcChunksExpr(child: Expression, maskExpr: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = child
  override def right: Expression = maskExpr

  override def dataType: DataType = CdcChunksExpr.Schema

  private lazy val mask: Long = maskExpr.eval(null) match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(s"bad mask: $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && maskExpr.foldable && mask >= 1L)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else if (child.dataType == StringType && maskExpr.foldable)
      // mask = 0 would otherwise surface as an opaque ArithmeticException
      // (h % 0) deep inside an executor task
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks needs mask >= 1, got $mask")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects (string, foldable mask), got ${child.dataType}")

  override protected def nullSafeEval(input: Any, m: Any): Any =
    CdcChunksExpr.compute(input.asInstanceOf[UTF8String], mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, m) =>
      s"graft.functions.expressions.CdcChunksExpr.compute($c, (long)($m))")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(child = newLeft, maskExpr = newRight)
}

object CdcChunksExpr {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("chunk_len", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false))),
    containsNull = false)

  def of(c: org.apache.spark.sql.Column, mask: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(CdcChunksExpr(
      org.apache.spark.sql.graft.Shim.expression(c), Literal(mask)))

  def compute(s: UTF8String, mask: Long): GenericArrayData = {
    val toks = TextKernels.tokenize(s)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val sb = new java.lang.StringBuilder
    var len = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (len > 0) sb.append(' ')
      sb.append(t)
      len += 1
      val h = Md5Prefix60.hash(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (h % mask == 0L) {
        out += InternalRow(len, UTF8String.fromString(sb.toString))
        sb.setLength(0)
        len = 0
      }
      i += 1
    }
    if (len > 0) out += InternalRow(len, UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }
}
