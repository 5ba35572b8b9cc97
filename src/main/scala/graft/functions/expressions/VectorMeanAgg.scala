package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Buffer: elementwise double sums + member count. */
final class VecMeanBuffer(var sums: Array[Double], var cnt: Long)

/** Elementwise mean of an array<float|double> column as a
  * TypedImperativeAggregate: partials are (dim doubles + count) per
  * partition — the k-means centroid-update kernel. The alternative
  * (posexplode to (id, dim, value) rows and groupBy(dim)) shuffles
  * n·dim skinny rows per iteration; this shuffles one fixed-size partial
  * per partition per group.
  */
case class VectorMeanAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_mean expects array<float|double>, got $t")
    }

  override def createAggregationBuffer(): VecMeanBuffer =
    new VecMeanBuffer(Array.emptyDoubleArray, 0L)

  override def update(b: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums.length < n) {
        val grown = new Array[Double](n)
        System.arraycopy(b.sums, 0, grown, 0, b.sums.length)
        b.sums = grown
      }
      var i = 0
      while (i < n) {
        b.sums(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      b.cnt += 1
    }
    b
  }

  override def merge(b: VecMeanBuffer, o: VecMeanBuffer): VecMeanBuffer = {
    if (b.sums.length < o.sums.length) {
      val grown = new Array[Double](o.sums.length)
      System.arraycopy(b.sums, 0, grown, 0, b.sums.length)
      b.sums = grown
    }
    var i = 0
    while (i < o.sums.length) { b.sums(i) += o.sums(i); i += 1 }
    b.cnt += o.cnt
    b
  }

  override def eval(b: VecMeanBuffer): Any =
    if (b.cnt == 0) null
    else new GenericArrayData(b.sums.map(_ / b.cnt))

  override def serialize(b: VecMeanBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + b.sums.length * 8)
    bb.putLong(b.cnt)
    bb.putInt(b.sums.length)
    b.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val cnt = bb.getLong
    val n = bb.getInt
    val sums = new Array[Double](n)
    var i = 0
    while (i < n) { sums(i) = bb.getDouble; i += 1 }
    new VecMeanBuffer(sums, cnt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object VectorMeanAgg {
  def of(c: Column): Column =
    Shim.column(new VectorMeanAgg(Shim.expression(c)).toAggregateExpression())
}
