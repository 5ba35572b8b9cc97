package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's portable 60-bit hash: the first 15 hex
  * nibbles of md5(s) read base-16 — i.e. (big-endian first 8 digest
  * bytes) >>> 4. Value-identical to the composable rendering
  * `conv(substr(md5(s),1,15),16,10)` (and to the DuckDB oracle fold), but
  * skips the hex-string materialization + base-16 reparse, and reuses one
  * MessageDigest per operator instance.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Md5Prefix60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of the md5 digest (big-endian), as a non-negative long. */
  def hash(bytes: Array[Byte]): Long = hashRange(bytes, 0, bytes.length)

  /** [[hash]] over a byte slice — lets gram kernels hash substrings without
    * per-gram array copies. */
  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def apply(c: Column): Column = Shim.column(Md5Prefix60(Shim.expression(c)))
}

/** Native (A·h + B) mod (2^61−1) universal-hash step (the minhash
  * permutation family). Value-identical to the DECIMAL(38,0) rendering and
  * the DuckDB HUGEINT oracle, computed with a 128-bit Mersenne reduction
  * (Math.multiplyHigh) instead of BigDecimal.
  */
case class MersennePermHash(a: Long, b: Long, child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"perm_hash expects bigint, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    MersennePermHash.hash(a, b, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MersennePermHash.hash(${a}L, ${b}L, $c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MersennePermHash {
  val P: Long = 2305843009213693951L // 2^61 - 1

  /** (a·h + b) mod P, exact for 0 ≤ a,h < 2^61: the 122-bit product
    * P = hi·2^64 + lo reduces via 2^64 ≡ 8, 2^61 ≡ 1 (mod 2^61−1).
    */
  def hash(a: Long, b: Long, h: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, h)
    val lo = a * h
    val r0 = ((hi << 3) + (lo >>> 61) + (lo & P)) % P
    (r0 + b) % P
  }

  def apply(a: Long, b: Long, c: Column): Column =
    Shim.column(MersennePermHash(a, b, Shim.expression(c)))
}
