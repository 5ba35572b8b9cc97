package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted DISTINCT hashed char-n-gram buckets of a string — the
  * language-ID feature kernel ([[graft.text.LangId]]): one pass over the
  * UTF-8 bytes computes codepoint offsets (grams are CODEPOINT windows,
  * matching Spark `substr`/`length` and the DuckDB oracle), hashes each
  * n-gram's byte slice with the portable [[Md5Prefix60]] (≡ the
  * composable `pmod(hash60(substr(…)), B)`), dedups into a presence
  * bitmap and emits the bucket ids ascending.
  *
  * The composable rendering (`array_sort(array_distinct(transform(
  * sequence(…), s -> …substr…)))`) runs every lambda as CodegenFallback
  * and re-evaluates the child per gram — O(len²) per row on long
  * documents; this kernel is one codegen'd O(len) pass, the same defect
  * class the fingerprint/entropy kernels fixed. Strings shorter than n
  * codepoints yield an empty array (→ bias-only features downstream).
  */
case class CharGramBuckets(child: Expression, n: Int, buckets: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1 && buckets >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_gram_buckets expects (string, n >= 1, buckets >= 1), got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CharGramBuckets.compute(input.asInstanceOf[UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CharGramBuckets.compute($c, $n, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramBuckets {

  private def charWidth(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else 4

  def compute(s: UTF8String, n: Int, buckets: Int): GenericArrayData = {
    val bytes = s.getBytes
    var numChars = 0
    var i = 0
    while (i < bytes.length) { i += charWidth(bytes(i)); numChars += 1 }
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](numChars + 1)
    i = 0
    var ci = 0
    while (i < bytes.length) { offsets(ci) = i; i += charWidth(bytes(i)); ci += 1 }
    offsets(numChars) = bytes.length
    val present = new Array[Boolean](buckets)
    var g = 0
    while (g <= numChars - n) {
      val off = offsets(g)
      val len = offsets(g + n) - off
      present((Md5Prefix60.hashRange(bytes, off, len) % buckets.toLong).toInt) = true
      g += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var b = 0
    while (b < buckets) { if (present(b)) out += b.toLong; b += 1 }
    new GenericArrayData(out.toArray)
  }

  def of(c: Column, n: Int, buckets: Int): Column =
    Shim.column(CharGramBuckets(Shim.expression(c), n, buckets))
}
