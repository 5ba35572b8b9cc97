package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** The parsed BM25 model the kernel scores against — flat parallel
  * arrays (query ids; per-query term strings and idfs; avgdl), built
  * once from the model Literal and shipped to executors as a codegen
  * reference object. */
final class ParsedBm25(val qids: Array[Long],
    val terms: Array[Array[String]], val idfs: Array[Array[Double]],
    val avgdl: Double) extends Serializable

/** Single-pass kernel for the streaming BM25 scorer
  * ([[graft.text.Bm25.streamScored]]): per document, ONE tokenization +
  * ONE count map, then every query scored against it — each matched
  * term's contribution is the exact pinned dag of the Column rendering,
  * floor(10⁶·(idf·((tf·2.2)/(tf + 1.2·(0.25 + 0.75·(dl/avgdl)))))),
  * summed as integers per query. Emits (query_id, score_q) for queries
  * with ≥ 1 matched term.
  *
  * Replaces the broadcast-join + HOF rendering (per-doc tf map via
  * map_from_entries/transform, a per-(doc, query) struct fold) whose
  * lambdas all ran as CodegenFallback — the scoring pass dominated the
  * row at ~9 s for the sf0.1 stream. The model rides as ONE nested
  * Literal (a single plan node holding DATA — not the 10³-node
  * expression tree the first literal rendering paid per micro-batch),
  * parsed once per plan and embedded as a codegen reference object.
  */
case class Bm25Scores(child: Expression, modelExpr: Expression,
    avgdlExpr: Expression) extends TernaryExpression {

  override def first: Expression = child
  override def second: Expression = modelExpr
  override def third: Expression = avgdlExpr

  override def dataType: DataType = Bm25Scores.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && modelExpr.foldable && avgdlExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bm25_scores expects (string, foldable model, foldable avgdl), got ${child.dataType}")

  @transient private lazy val parsed: ParsedBm25 = {
    val arr = modelExpr.eval(null).asInstanceOf[ArrayData]
    val n = arr.numElements()
    val qids = new Array[Long](n)
    val terms = new Array[Array[String]](n)
    val idfs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val q = arr.getStruct(i, 2)
      qids(i) = q.getLong(0)
      val ts = q.getArray(1)
      val m = ts.numElements()
      terms(i) = new Array[String](m)
      idfs(i) = new Array[Double](m)
      var j = 0
      while (j < m) {
        val t = ts.getStruct(j, 2)
        terms(i)(j) = t.getUTF8String(0).toString
        idfs(i)(j) = t.getDouble(1)
        j += 1
      }
      i += 1
    }
    new ParsedBm25(qids, terms, idfs,
      avgdlExpr.eval(null).asInstanceOf[Double])
  }

  override protected def nullSafeEval(input: Any, m: Any, a: Any): Any =
    Bm25Scores.compute(input.asInstanceOf[UTF8String], parsed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25model", parsed,
      "graft.functions.expressions.ParsedBm25")
    defineCodeGen(ctx, ev, (c, _, _) =>
      s"graft.functions.expressions.Bm25Scores.compute($c, $ref)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(child = newFirst, modelExpr = newSecond, avgdlExpr = newThird)
}

object Bm25Scores {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("score_q", LongType, nullable = false))),
    containsNull = false)

  def of(text: org.apache.spark.sql.Column,
      model: org.apache.spark.sql.Column,
      avgdl: Double): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shim.column(Bm25Scores(
      org.apache.spark.sql.graft.Shim.expression(text),
      org.apache.spark.sql.graft.Shim.expression(model),
      org.apache.spark.sql.catalyst.expressions.Literal(avgdl)))

  def compute(s: UTF8String, p: ParsedBm25): GenericArrayData = {
    val toks = TextKernels.tokenize(s)
    val dl = toks.length.toDouble
    val counts = TextKernels.countTokens(toks)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var q = 0
    while (q < p.qids.length) {
      val ts = p.terms(q)
      val ids = p.idfs(q)
      var score = 0L
      var matched = 0
      var j = 0
      while (j < ts.length) {
        val c = counts.get(ts(j))
        if (c != null) {
          val tf = c.longValue.toDouble
          // the exact pinned dag of the Column rendering — op for op
          score += math.floor(1.0e6 * (ids(j) *
            ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / p.avgdl)))))).toLong
          matched += 1
        }
        j += 1
      }
      if (matched > 0) out += InternalRow(p.qids(q), score)
      q += 1
    }
    new GenericArrayData(out.toArray)
  }
}
