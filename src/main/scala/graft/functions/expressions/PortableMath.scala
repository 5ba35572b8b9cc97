package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Native form of [[graft.functions.PortableLog.pexp]] — the portable
  * exponential's 16 squarings as a LOOP. The pure-column rendering would
  * textually nest e*e sixteen deep (a 2^16-node expression tree); here
  * eval and codegen both call the one Scala definition, so the dag — and
  * therefore the double — is identical everywhere it is computed.
  */
case class PortableExpExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"portable_exp expects double, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.PortableLog.pexp(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableLog.pexp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableExpExpr {
  def apply(c: Column): Column = Shim.column(PortableExpExpr(Shim.expression(c)))
}
