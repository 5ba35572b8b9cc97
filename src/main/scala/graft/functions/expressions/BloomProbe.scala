package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long-valued column against a BROADCAST Bloom
  * filter — the per-row half of the incremental-dedup shape in
  * [[graft.dedup.Dedup.bloomMembership]]: "might this digest be in the
  * training set?" answered from an executor-resident bit array, no join,
  * no shuffle, no state.
  *
  * The filter travels as a `Broadcast[BloomFilter]` handle, NOT as a plan
  * literal: a 10⁹-item filter at 1% fpp is ~1.2 GB of bits, which torrent
  * broadcast distributes once per executor, while a binary literal would
  * re-ship with every serialized task. Codegen pins the broadcast
  * reference into the generated class (`addReferenceObj`), so the hot
  * loop is one `mightContainLong` call — two XxH64-derived bit reads —
  * per row, inside whole-stage codegen.
  *
  * Contract (what makes the surrounding operator EXACT): Bloom filters
  * have no false negatives, so a probe returning false is definitive
  * absence; true is only "maybe", and callers must re-verify positives
  * against the real digest relation. The surrounding query's RESULT is
  * therefore identical for any fpp / bit layout — the filter only prunes.
  */
case class BloomMightContainLong(bc: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long expects bigint, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    bc.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainLong($c)")
  }

  override def prettyName: String = "bloom_might_contain_long"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  def of(bc: Broadcast[BloomFilter], c: Column): Column =
    Shim.column(BloomMightContainLong(bc, Shim.expression(c)))
}
