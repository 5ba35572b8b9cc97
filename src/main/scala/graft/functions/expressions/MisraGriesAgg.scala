package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitter SKETCH over a string column: at most
  * `m` counters per buffer, with the mergeable-summaries combine (Agarwal
  * et al., PODS'12): add counters, then subtract the (m+1)-th largest
  * value and drop non-positives. The classic guarantee survives merging:
  * total decrement across the stream is ≤ N/(m+1), so every item with
  * true count > N/(m+1) retains a positive counter and appears in the
  * candidate set.
  *
  * The OUTPUT is the candidate key set only (sorted string array), not the
  * counter values: counters are merge-order-dependent, keys are what the
  * exact verify pass needs. The deterministic contract therefore lives one
  * level up ([[graft.text.CorpusStats.heavyHitters]]): sketch candidates →
  * exact counts of candidates only → threshold filter. The final output is
  * exactly {token : count ≥ T} for any T > N/(m+1), independent of
  * partitioning and merge order (superset property + exact verify), while
  * the full-vocabulary shuffle is replaced by O(m) state per partition.
  */
case class MisraGriesAgg(child: Expression, mExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val m: Int = mExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"bad m: $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if mExpr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects a string column + foldable m, got $t")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      b.updateWith(s) { case Some(c) => Some(c + 1L); case None => Some(1L) }
      MisraGriesAgg.shrink(b, m)
    }
    b
  }

  override def merge(b: mutable.HashMap[String, Long],
      o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesAgg.mergeInto(b, o, m)

  override def eval(b: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      b.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.serializeBuffer(b)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.deserializeBuffer(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), mExpr = newChildren(1))
}

/** [[MisraGriesAgg]] with the COUNTERS in the output — array<struct<token,
  * cnt>> sorted by token — for callers that keep folding: the ingestion
  * profiler collects each micro-batch's ≤ m-entry sketch and merges it
  * into running cross-batch state with the same combine, which needs the
  * counter values, not just the candidate keys. The counters are
  * merge-order-dependent (only the SUPERSET guarantee is deterministic),
  * so this form is an internal carrier — the deterministic contract still
  * lives in the exact verify pass one level up.
  */
case class MisraGriesSketchAgg(child: Expression, mExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  private lazy val m: Int = mExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"bad m: $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if mExpr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries_sketch expects a string column + foldable m, got $t")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      b.updateWith(s) { case Some(c) => Some(c + 1L); case None => Some(1L) }
      MisraGriesAgg.shrink(b, m)
    }
    b
  }

  override def merge(b: mutable.HashMap[String, Long],
      o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesAgg.mergeInto(b, o, m)

  override def eval(b: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(b.toArray.sortBy(_._1).map { case (k, v) =>
      InternalRow(UTF8String.fromString(k), v): Any
    })

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.serializeBuffer(b)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.deserializeBuffer(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), mExpr = newChildren(1))
}

object MisraGriesAgg {
  def of(c: Column, m: Int): Column =
    Shim.column(new MisraGriesAgg(Shim.expression(c), Literal(m))
      .toAggregateExpression())

  def sketchOf(c: Column, m: Int): Column =
    Shim.column(new MisraGriesSketchAgg(Shim.expression(c), Literal(m))
      .toAggregateExpression())

  /** Subtract the (m+1)-th largest counter from all and drop ≤ 0 — the
    * one primitive update-overflow, partition merge and the ingestion
    * cross-batch fold all reduce to. With m+1 entries the (m+1)-th
    * largest is the min, matching the textbook update; after one
    * application at most m entries remain positive (strictly fewer than
    * m+1 can exceed the (m+1)-th largest).
    */
  def shrink(b: mutable.HashMap[String, Long], m: Int): Unit =
    while (b.size > m) {
      val cut =
        if (b.size == m + 1) {
          // update path: with exactly m+1 entries the (m+1)-th largest IS
          // the min — one O(m) pass, not an O(m log m) sort + array copy
          // per inserted token once the buffer saturates
          var mn = Long.MaxValue
          b.valuesIterator.foreach(v => if (v < mn) mn = v)
          mn
        } else {
          // merge path only (≤ 2m entries, once per combine)
          val vs = b.values.toArray
          java.util.Arrays.sort(vs)
          vs(vs.length - (m + 1)) // (m+1)-th largest
        }
      b.filterInPlace((_, v) => v - cut > 0L)
      b.mapValuesInPlace((_, v) => v - cut)
    }

  /** The mergeable-summaries combine (Agarwal et al., PODS'12): add all
    * counters, then one shrink. Exposed so the ingestion-side
    * cross-batch fold merges exactly as the in-plan partials do.
    */
  def mergeInto(b: mutable.HashMap[String, Long],
      o: Iterable[(String, Long)], m: Int): mutable.HashMap[String, Long] = {
    o.foreach { case (k, v) =>
      b.updateWith(k) { case Some(c) => Some(c + v); case None => Some(v) }
    }
    shrink(b, m)
    b
  }

  private[graft] def serializeBuffer(
      b: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = b.toArray.map { case (k, v) =>
      (k.getBytes(StandardCharsets.UTF_8), v)
    }
    val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 12).sum)
    bb.putInt(items.length)
    items.foreach { case (kb, v) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(v)
    }
    bb.array()
  }

  private[graft] def deserializeBuffer(
      bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kl = bb.getInt
      val kb = new Array[Byte](kl)
      bb.get(kb)
      b.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    b
  }
}
