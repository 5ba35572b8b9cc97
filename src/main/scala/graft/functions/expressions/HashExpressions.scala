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

/** All k minhash signature minima in one pass: for each permutation p,
  * min over the gram-hash array of (A_p·h + B_p) mod (2^61−1). Output
  * array<long> of length k (empty input → empty array, so a downstream
  * posexplode emits no signature rows — the "docs with no shingles" rule).
  *
  * Value-identical to k separate `array_min(transform(hs, permHash(p,_)))`
  * columns, but one tight JVM loop instead of k higher-order-function
  * evaluations per row — k× less expression eval and a far smaller
  * codegen unit (the 12-wide HOF chain was measured to cost seconds of
  * Janino/JIT warmup alone).
  */
case class MinHashSigs(child: Expression, as: Seq[Long], bs: Seq[Long])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs expects array<bigint>, got $t")
    }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val k = as.length
    if (n == 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Long](k)
    var p = 0
    while (p < k) {
      val a = as(p); val b = bs(p)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = MersennePermHash.hash(a, b, arr.getLong(i))
        if (h < m) m = h
        i += 1
      }
      out(p) = m
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhs", this, classOf[MinHashSigs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  /** k permutations with the engine's standard (A_p, B_p) parameter family. */
  def of(c: Column, k: Int): Column = {
    val params = (0 until k).map(graft.functions.GraftFunctions.permHashParams)
    Shim.column(MinHashSigs(Shim.expression(c), params.map(_._1), params.map(_._2)))
  }
}

/** 60-bit SimHash signature in ONE pass over the token-hash array (with
  * multiplicity): bit j of the result is set iff strictly more hashes have
  * bit j set than clear. Value-identical to the composable rendering —
  * explode(tokens)×explode(0..59) → sum(±1) → bit-OR re-aggregate — that
  * the DuckDB oracle still executes, but without the ×60 row blowup and
  * its two aggregation exchanges: the signature never leaves the row
  * (one narrow projection; the only shuffle left in simhash dedup is the
  * band join). Callers must drop zero-token docs first (the exploded
  * rendering emitted no rows for them).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_sig expects array<bigint>, got $t")
    }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 60) {
        counts(j) += (((h >>> j) & 1L).toInt << 1) - 1 // ±1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shs", this, classOf[SimHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  def of(c: Column): Column = Shim.column(SimHashSig(Shim.expression(c)))
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
