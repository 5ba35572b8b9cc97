package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** The parsed unigram-LM tokenizer the kernels segment against: piece →
  * COST (the negated quantized log-prob, so Viterbi minimizes an exact
  * integer sum), the max piece length (bounds the DP's inner loop), and
  * the OOV single-character cost (covers characters outside the trained
  * alphabet — never hit by the shared-oracle rows, deterministic by
  * construction for production input). Built once from the model Literal,
  * shipped as a codegen reference object.
  *
  * All indexing is by Unicode CODEPOINT, not UTF-16 code unit — the
  * training side ([[graft.text.Unigram.seedCounts]], Spark `substr`/
  * `length`) and the DuckDB oracle both count codepoints, so a UTF-16
  * DP would segment supplementary-plane text (emoji, astral CJK) into
  * lone surrogate halves that the trained vocabulary cannot contain
  * (r12 advice). `maxLen` is therefore in codepoints too. */
final class ParsedUnigram(val cost: java.util.HashMap[String, java.lang.Long],
    val maxLen: Int, val oovCost: Long) extends Serializable {

  /** Viterbi segmentation of one word under the piece costs — minimize
    * total cost; ties prefer the SMALLEST split point j (iterating j
    * ascending with a strictly-less acceptance keeps the smallest —
    * exactly the oracle's `ROW_NUMBER() OVER (ORDER BY cost, j)` pick).
    * Single characters missing from the vocabulary cost `oovCost`, so
    * every word segments. Positions are CODEPOINT indexes into `offs`
    * ([[ParsedUnigram.cpOffsets]]); returns the backpointer array
    * bp(k) = j over those positions.
    */
  def viterbi(w: String, offs: Array[Int]): Array[Int] = {
    val n = offs.length - 1
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var k = 1
    while (k <= n) {
      var best = Long.MaxValue
      var bj = -1
      var j = math.max(0, k - maxLen)
      while (j < k) {
        if (dp(j) < Long.MaxValue) {
          val c =
            if (k - j == 1) {
              val q = cost.get(w.substring(offs(j), offs(k)))
              if (q == null) oovCost else q.longValue
            } else {
              val q = cost.get(w.substring(offs(j), offs(k)))
              if (q == null) Long.MaxValue else q.longValue
            }
          if (c < Long.MaxValue && dp(j) + c < best) { best = dp(j) + c; bj = j }
        }
        j += 1
      }
      dp(k) = best
      bp(k) = bj
      k += 1
    }
    bp
  }
}

object ParsedUnigram {
  /** UTF-16 offset of each codepoint boundary: offs(i) = start of
    * codepoint i, offs(n) = s.length — one linear scan, shared by the
    * DP and the piece extraction so every substring lands on a
    * codepoint boundary (never a surrogate half). */
  def cpOffsets(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val offs = new Array[Int](n + 1)
    var i = 0
    var o = 0
    while (i < n) { offs(i) = o; o = s.offsetByCodePoints(o, 1); i += 1 }
    offs(n) = s.length
    offs
  }
}

/** Viterbi path PIECES of one word — the training-side kernel (the
  * E-step's usage counting explodes these per word TYPE, weighted by the
  * type's corpus count; the corpus itself is never re-segmented during
  * training). Output in left-to-right order. */
case class UnigramPieces(child: Expression, modelExpr: Expression,
    oovExpr: Expression) extends TernaryExpression {

  override def first: Expression = child
  override def second: Expression = modelExpr
  override def third: Expression = oovExpr

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && modelExpr.foldable && oovExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_pieces expects (string, foldable model, foldable oov), got ${child.dataType}")

  @transient private lazy val parsed: ParsedUnigram =
    UnigramKernels.parse(modelExpr, oovExpr)

  override protected def nullSafeEval(input: Any, m: Any, o: Any): Any =
    UnigramKernels.pieces(input.asInstanceOf[UTF8String], parsed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigram", parsed,
      "graft.functions.expressions.ParsedUnigram")
    defineCodeGen(ctx, ev, (c, _, _) =>
      s"graft.functions.expressions.UnigramKernels.pieces($c, $ref)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(child = newFirst, modelExpr = newSecond, oovExpr = newThird)
}

/** Per-document segmentation stats in ONE pass — the apply/serving
  * kernel: tokenize the text once, Viterbi-segment every token, emit
  * struct(n_tokens, n_pieces, logp_q) where logp_q sums the (negated)
  * piece costs as exact integers (order-free). Pure column work — no
  * shuffle, streams as-is. */
case class UnigramStats(child: Expression, modelExpr: Expression,
    oovExpr: Expression) extends TernaryExpression {

  override def first: Expression = child
  override def second: Expression = modelExpr
  override def third: Expression = oovExpr

  override def dataType: DataType = UnigramKernels.StatsSchema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && modelExpr.foldable && oovExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_stats expects (string, foldable model, foldable oov), got ${child.dataType}")

  @transient private lazy val parsed: ParsedUnigram =
    UnigramKernels.parse(modelExpr, oovExpr)

  override protected def nullSafeEval(input: Any, m: Any, o: Any): Any =
    UnigramKernels.stats(input.asInstanceOf[UTF8String], parsed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigram", parsed,
      "graft.functions.expressions.ParsedUnigram")
    defineCodeGen(ctx, ev, (c, _, _) =>
      s"graft.functions.expressions.UnigramKernels.stats($c, $ref)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(child = newFirst, modelExpr = newSecond, oovExpr = newThird)
}

object UnigramKernels {

  val StatsSchema: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("logp_q", LongType, nullable = false)))

  private[expressions] def parse(modelExpr: Expression,
      oovExpr: Expression): ParsedUnigram = {
    val arr = modelExpr.eval(null).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[String, java.lang.Long](arr.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      val p = s.getUTF8String(0).toString
      // model carries q (the quantized log-prob, negative); the DP
      // minimizes COST = -q
      m.put(p, -s.getLong(1))
      val cpLen = p.codePointCount(0, p.length)
      if (cpLen > maxLen) maxLen = cpLen
      i += 1
    }
    new ParsedUnigram(m, maxLen, -oovExpr.eval(null).asInstanceOf[Long])
  }

  def pieces(w: UTF8String, p: ParsedUnigram): GenericArrayData = {
    val s = w.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val offs = ParsedUnigram.cpOffsets(s)
    val bp = p.viterbi(s, offs)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var k = offs.length - 1
    while (k > 0) { out += s.substring(offs(bp(k)), offs(k)); k = bp(k) }
    new GenericArrayData(out.reverse.map(UTF8String.fromString).toArray[Any])
  }

  def stats(text: UTF8String, p: ParsedUnigram): InternalRow = {
    val toks = TextKernels.tokenize(text)
    var nPieces = 0L
    var q = 0L
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      val offs = ParsedUnigram.cpOffsets(w)
      val bp = p.viterbi(w, offs)
      var k = offs.length - 1
      while (k > 0) {
        val piece = w.substring(offs(bp(k)), offs(k))
        val c = p.cost.get(piece)
        q -= (if (c == null) p.oovCost else c.longValue) // logp = -cost
        nPieces += 1L
        k = bp(k)
      }
      i += 1
    }
    InternalRow(toks.length.toLong, nPieces, q)
  }

  def piecesOf(word: org.apache.spark.sql.Column,
      model: org.apache.spark.sql.Column, oovQ: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(UnigramPieces(
      org.apache.spark.sql.graft.Shim.expression(word),
      org.apache.spark.sql.graft.Shim.expression(model),
      org.apache.spark.sql.catalyst.expressions.Literal(oovQ)))

  def statsOf(text: org.apache.spark.sql.Column,
      model: org.apache.spark.sql.Column, oovQ: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(UnigramStats(
      org.apache.spark.sql.graft.Shim.expression(text),
      org.apache.spark.sql.graft.Shim.expression(model),
      org.apache.spark.sql.catalyst.expressions.Literal(oovQ)))
}
