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

/** Shared machinery for the elementwise-quantized vector aggregations:
  * per element j the buffer accumulates Σ floor(v_j · scale) as exact
  * int64 (order-free — any partition order yields the same sums, which
  * is what lets a single-threaded DuckDB oracle regenerate them with
  * `SUM(CAST(floor(v[j]·scale) AS BIGINT))`), plus the member count.
  * Subclasses differ only in what [[eval]] derives from the buffer.
  *
  * Exactness bounds (documented, not enforced): |v_j·scale| < 2^62/rows
  * for the int64 sum. At scale=10^6 with |v_j| ≤ 5 that allows ~10^9
  * rows per group — far beyond any real group at 100 TB.
  */
abstract class VecQuantAggBase extends TypedImperativeAggregate[VecQuantBuffer] {
  def child: Expression
  def scaleExpr: Expression

  override def children: Seq[Expression] = Seq(child, scaleExpr)
  override def nullable: Boolean = true

  protected lazy val scale: Double = scaleExpr.eval(null) match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case other => throw new IllegalArgumentException(s"bad scale: $other")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def aggName: String

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if scaleExpr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$aggName expects array<float|double> + foldable scale, got $t")
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
}

/** Elementwise QUANTIZED mean of an array<float|double> column:
  * sum_j floor(v_j · scale) as exact int64, eval = sum / (scale · count).
  *
  * Exists for cross-engine determinism: [[VectorMeanAgg]] sums doubles in
  * partition order, so its centroids are not bit-reproducible by a
  * single-threaded oracle. This is the declared trained-IVF centroid
  * kernel (knn_ivf_trained); |sum| < 2^53 keeps the final double
  * division exact-input.
  */
case class VectorQuantMeanAgg(child: Expression, scaleExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends VecQuantAggBase {

  override protected def aggName: String = "vector_quant_mean"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def eval(b: VecQuantBuffer): Any =
    if (b.cnt == 0) null
    // same tree as the oracle: CAST(s AS DOUBLE) / (scale * n)
    else new GenericArrayData(b.sums.map(s => s.toDouble / (scale * b.cnt.toDouble)))

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

/** The raw elementwise quantized SUMS (exact int64 array) — the
  * second-moment accumulator the PCA power iteration consumes: fed the
  * flattened outer product of each embedding with itself, the output IS
  * the quantized Gram matrix in row-major order, independent of
  * partitioning and merge order (integer adds), so the driver-side
  * iteration and the DuckDB oracle both start from bit-identical input.
  */
case class VectorQuantSumAgg(child: Expression, scaleExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends VecQuantAggBase {

  override protected def aggName: String = "vector_quant_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def eval(b: VecQuantBuffer): Any =
    if (b.cnt == 0) null
    else new GenericArrayData(b.sums.map(_.asInstanceOf[Any]))

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorQuantSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorQuantSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), scaleExpr = newChildren(1))
}

object VectorQuantSumAgg {
  def of(c: Column, scale: Double): Column =
    Shim.column(new VectorQuantSumAgg(Shim.expression(c), Literal(scale))
      .toAggregateExpression())
}

/** Quantized GRAM accumulator: fed the raw embedding, update() forms the
  * row-major outer product INSIDE the aggregation —
  * sums[i·d+j] += floor(v_i · v_j · scale) — so the d² = 4096 per-row
  * multiplies run as compiled long arithmetic instead of the nested
  * `transform`+`flatten` HOF dag that previously materialized each
  * outer product as an interpreted CodegenFallback array before
  * [[VectorQuantSumAgg]] re-read it (r12 advice: per-row O(d²)
  * interpreted work on a corpus-wide embedding scan). Values are
  * BIT-IDENTICAL: the HOF path computed the same double product
  * (elements cast to double, one IEEE multiply) and the same
  * floor(x·scale) quantization; only where the multiply happens moved.
  */
case class GramQuantSumAgg(child: Expression, scaleExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends VecQuantAggBase {

  override protected def aggName: String = "gram_quant_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloatElem =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def update(b: VecQuantBuffer, input: InternalRow): VecQuantBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val d = new Array[Double](n)
      var i = 0
      while (i < n) {
        d(i) = if (isFloatElem) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      if (b.sums.length < n * n) {
        val grown = new Array[Long](n * n)
        System.arraycopy(b.sums, 0, grown, 0, b.sums.length)
        b.sums = grown
      }
      var idx = 0
      i = 0
      while (i < n) {
        val di = d(i)
        var j = 0
        while (j < n) {
          b.sums(idx) += math.floor(di * d(j) * scale).toLong
          idx += 1
          j += 1
        }
        i += 1
      }
      b.cnt += 1
    }
    b
  }

  override def eval(b: VecQuantBuffer): Any =
    if (b.cnt == 0) null
    else new GenericArrayData(b.sums.map(_.asInstanceOf[Any]))

  override def withNewMutableAggBufferOffset(newOffset: Int): GramQuantSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramQuantSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), scaleExpr = newChildren(1))
}

object GramQuantSumAgg {
  def of(c: Column, scale: Double): Column =
    Shim.column(new GramQuantSumAgg(Shim.expression(c), Literal(scale))
      .toAggregateExpression())
}
