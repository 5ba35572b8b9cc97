package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass document fingerprint kernel: over the char n-gram set of the
  * input string, computes (min [[Md5Prefix60]] hash, distinct-gram count)
  * in one loop — `(fp BIGINT, n_grams INT)` struct, fp NULL (and n_grams 0)
  * when the string is shorter than n chars.
  *
  * Value-identical to the composable higher-order-function rendering
  * (`array_min(transform(grams, hash60))`, `size(array_distinct(grams))`)
  * and to the DuckDB oracle, but avoids its two scale problems, both
  * measured: the lambda re-evaluates the (lowercased) child per gram — no
  * CSE inside HOFs, so an O(len) child makes the column O(len²) per row —
  * and the gram array materializes twice (once per output column). Here the
  * child is evaluated once, codepoint byte-offsets are computed in one scan,
  * and each gram is hashed straight from the string's UTF-8 bytes.
  */
case class GramFingerprint(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = GramFingerprint.Schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_fingerprint expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    GramFingerprint.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.GramFingerprint.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramFingerprint {
  val Schema: StructType = StructType(Seq(
    StructField("fp", LongType, nullable = true),
    StructField("n_grams", IntegerType, nullable = false)))

  private def charWidth(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else 4

  /** One pass over the UTF-8 bytes: offsets scan, then per gram one md5
    * over the byte slice (min-tracked) and one set insert (distinct count).
    */
  def compute(s: UTF8String, n: Int): InternalRow = {
    val bytes = s.getBytes
    // codepoint start offsets (+ terminal end offset)
    var numChars = 0
    var i = 0
    while (i < bytes.length) { i += charWidth(bytes(i)); numChars += 1 }
    if (numChars < n) return InternalRow(null, 0)
    val offsets = new Array[Int](numChars + 1)
    i = 0
    var ci = 0
    while (i < bytes.length) { offsets(ci) = i; i += charWidth(bytes(i)); ci += 1 }
    offsets(numChars) = bytes.length
    var minH = Long.MaxValue
    val seen = new java.util.HashSet[String]()
    var g = 0
    while (g <= numChars - n) {
      val off = offsets(g)
      val len = offsets(g + n) - off
      val h = Md5Prefix60.hashRange(bytes, off, len)
      if (h < minH) minH = h
      seen.add(new String(bytes, off, len, java.nio.charset.StandardCharsets.UTF_8))
      g += 1
    }
    InternalRow(minH, seen.size)
  }

  def of(c: Column, n: Int): Column = Shim.column(GramFingerprint(Shim.expression(c), n))
}
