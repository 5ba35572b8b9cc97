package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Buffer: elementwise quantized (long) sums + member count. */
final class VecQuantBuffer(var sums: Array[Long], var cnt: Long)

/** Elementwise QUANTIZED mean of an array<float|double> column:
  * sum_j floor(v_j · scale) as exact int64, eval = sum / (scale · count).
  *
  * Exists for cross-engine determinism: [[VectorMeanAgg]] sums doubles in
  * partition order, so its centroids are not bit-reproducible by a
  * single-threaded oracle. Integer sums are associative/commutative —
  * any partition order yields the same centroid, and DuckDB regenerates
  * it exactly with `SUM(CAST(floor(v[j]·scale) AS BIGINT))`. This is the
  * declared trained-IVF centroid kernel (knn_ivf_trained).
  *
  * Exactness bounds (documented, not enforced): |v_j·scale| < 2^62/rows
  * for the int64 sum, and |sum| < 2^53 so the final double division is
  * exact-input. At scale=10^6 with |v_j| ≤ 5 that allows ~10^9 rows per
  * cell — far beyond any real cell at 100 TB (cells are corpus/k).
  */
case class VectorQuantMeanAgg(child: Expression, scaleExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecQuantBuffer] {

  override def children: Seq[Expression] = Seq(child, scaleExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val scale: Double = scaleExpr.eval(null) match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case other => throw new IllegalArgumentException(s"bad scale: $other")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if scaleExpr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_quant_mean expects array<float|double> + foldable scale, got $t")
    }

  override def createAggregationBuffer(): VecQuantBuffer =
    new VecQuantBuffer(Array.emptyLongArray, 0L)

  override def update(b: VecQuantBuffer, input: InternalRow): VecQuantBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums.length < n) {
        val grown = new Array[Long](n)
        System.arraycopy(b.sums, 0, grown, 0, b.sums.length)
        b.sums = grown
      }
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        b.sums(i) += math.floor(x * scale).toLong
        i += 1
      }
      b.cnt += 1
    }
    b
  }

  override def merge(b: VecQuantBuffer, o: VecQuantBuffer): VecQuantBuffer = {
    if (b.sums.length < o.sums.length) {
      val grown = new Array[Long](o.sums.length)
      System.arraycopy(b.sums, 0, grown, 0, b.sums.length)
      b.sums = grown
    }
    var i = 0
    while (i < o.sums.length) { b.sums(i) += o.sums(i); i += 1 }
    b.cnt += o.cnt
    b
  }

  override def eval(b: VecQuantBuffer): Any =
    if (b.cnt == 0) null
    // same tree as the oracle: CAST(s AS DOUBLE) / (scale * n)
    else new GenericArrayData(b.sums.map(s => s.toDouble / (scale * b.cnt.toDouble)))

  override def serialize(b: VecQuantBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + b.sums.length * 8)
    bb.putLong(b.cnt)
    bb.putInt(b.sums.length)
    b.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecQuantBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val cnt = bb.getLong
    val n = bb.getInt
    val sums = new Array[Long](n)
    var i = 0
    while (i < n) { sums(i) = bb.getLong; i += 1 }
    new VecQuantBuffer(sums, cnt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorQuantMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorQuantMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), scaleExpr = newChildren(1))
}

object VectorQuantMeanAgg {
  def of(c: Column, scale: Double): Column =
    Shim.column(new VectorQuantMeanAgg(Shim.expression(c), Literal(scale))
      .toAggregateExpression())
}
