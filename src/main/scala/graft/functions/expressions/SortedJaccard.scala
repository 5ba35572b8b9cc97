package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Exact Jaccard similarity of two ascending-sorted duplicate-free
  * arrays — string shingle sets, or their 60-bit-hash images for callers
  * that trade the string compare for a long compare — the set-overlap
  * kernel of every near-dup verify, fused into ONE scalar.
  *
  * Exists because the built-in rendering
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect))`
  * is hostile twice over at verify-join row counts: array_intersect
  * builds a fresh hash set per CALL per ROW, and Catalyst multiplies the
  * calls — the threshold filter pushes into the join CONDITION with the
  * whole subtree inlined, the projection re-computes it, and the
  * numerator/denominator each reference it (measured 4+ evaluations/row,
  * ~17 µs each, 20+ s for the 7·10⁵-candidate n-gram verify at sf0.1
  * where the joins themselves cost 2 s). Fusing numerator and
  * denominator into one allocation-light two-pointer merge makes each
  * evaluation O(|a|+|b|) comparisons (~1 µs), and callers pair it with a
  * CONDITIONAL aggregation (min/max over `when(j ≥ τ, …)`) instead of a
  * row filter so nothing pushes into the join condition — one evaluation
  * per candidate row, end of story.
  *
  * The division is the same single IEEE op as the spelled-out column
  * form (exact integer counts, one correctly-rounded divide), so DuckDB
  * oracles replay it bit-identically from the true sets. Sortedness is
  * the CALLER's contract (sort once per document at shingle build,
  * compare many times at verify); unsorted input silently undercounts,
  * exactly like handing a merge join unsorted runs. Both arrays empty →
  * 0.0 (no shared shingle evidence).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val longElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(e: Expression) = e.dataType match {
      case ArrayType(t @ (StringType | LongType), _) => Some(t)
      case _ => None
    }
    (elem(left), elem(right)) match {
      case (Some(a), Some(b)) if a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard expects two array<string> or two array<bigint>, " +
          s"got ${left.dataType} / ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < nx && j < ny) {
      val c =
        if (longElems) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val denom = nx + ny - cnt
    if (denom == 0) 0.0 else cnt.toDouble / denom.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      val denom = ctx.freshName("denom")
      val cmp =
        if (longElems) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $cmp;
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |int $denom = $nx + $ny - $cnt;
         |${ev.value} = $denom == 0 ? 0.0 : (double) $cnt / (double) $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  def of(a: Column, b: Column): Column =
    Shim.column(SortedJaccard(Shim.expression(a), Shim.expression(b)))
}
