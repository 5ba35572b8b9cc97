package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Mergeable bottom-k-DISTINCT sketch over an int64 column: at most `k`
  * distinct values per buffer, always the k smallest seen so far. This
  * is the k-minimum-values (KMV) synopsis of
  * Bar-Yossef et al. (RANDOM'02) / Beyer et al. (SIGMOD'07): fed a
  * uniform hash of each item, the k-th smallest retained value is an
  * order statistic of the distinct-value set, from which the distinct
  * count estimates as (k−1)·M/h₍k₎ for hash range [0, M).
  *
  * Unlike HyperLogLog-style synopses the KMV sketch is EXACTLY
  * deterministic: the k smallest distinct values of a set are a pure
  * function of the set — independent of partitioning, merge order and
  * batch split (bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)), so the
  * combine below loses nothing) — which is what lets a DuckDB oracle
  * re-derive the sketch bit-identically with ORDER BY h LIMIT k. State is
  * O(k) per partition; one k-entry partial per partition reaches the
  * final merge. When fewer than k distinct values exist the sketch IS the
  * distinct set (the exact small-cardinality path).
  *
  * Output: the retained values as an ascending-sorted long array.
  */
case class BottomKDistinctAgg(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"bad k: $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType if kExpr.foldable && k >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case LongType if kExpr.foldable =>
        // k = 0 would otherwise surface as an opaque NoSuchElementException
        // on b.last at the first input row, deep inside an executor task
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottom_k_distinct needs k >= 1, got $k")
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k_distinct expects a long column + foldable k, got $t")
    }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  override def update(b: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) BottomKDistinctAgg.add(b, v.asInstanceOf[Long], k)
    b
  }

  override def merge(b: mutable.TreeSet[Long],
      o: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    o.foreach(BottomKDistinctAgg.add(b, _, k))
    b
  }

  override def eval(b: mutable.TreeSet[Long]): Any =
    new GenericArrayData(b.toArray.map(_.asInstanceOf[Any]))

  override def serialize(b: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object BottomKDistinctAgg {
  def of(c: Column, k: Int): Column =
    Shim.column(new BottomKDistinctAgg(Shim.expression(c), Literal(k))
      .toAggregateExpression())

  /** The one primitive every path (update, partition merge, ingestion
    * cross-batch fold) reduces to: insert v iff the sketch is not yet
    * full or v beats the current maximum; dedup is free (TreeSet). The
    * early `v >= max` exit keeps the saturated update path at one
    * comparison for the overwhelming majority of rows (a uniform hash
    * beats the current k-th minimum with probability k/D).
    */
  def add(b: mutable.TreeSet[Long], v: Long, k: Int): Unit =
    if (b.size < k) { b.add(v); () }
    else if (v < b.last && b.add(v)) { b.remove(b.last); () }
}
