package graft.operators

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** Buffer: raw (ts_us, cents) pairs collected for one group. */
final class FfatBuffer(val ts: ArrayBuffer[Long], val vs: ArrayBuffer[Long])

/** Buffer: pre-combined (anchor_ts, cnt, sum, min, max) pane partials
  * collected for one group (the PLQ output of the paned feed).
  */
final class FfatPartialBuffer(val ts: ArrayBuffer[Long], val cnt: ArrayBuffer[Long],
    val sum: ArrayBuffer[Long], val mn: ArrayBuffer[Long], val mx: ArrayBuffer[Long])

/** FlatFAT sliding/hopping time windows as a `TypedImperativeAggregate` —
  * the reference's Ffat_Windows (/root/reference/wf/flatfat.hpp:85-…): an
  * implicit binary tree over the window buffer whose internal nodes hold
  * combined partials, so each window result is an O(log n) range combine
  * of an ASSOCIATIVE (not necessarily invertible) lift/comb pair — here
  * (cnt, sum, min, max); min/max are the non-invertible part that a
  * subtract-the-expired trick cannot handle.
  *
  * Plan shape vs the explode rendering ([[TimeWindows.sliding]]): explode
  * multiplies every input row by len/slide BEFORE the shuffle; this
  * aggregate shuffles each row exactly once (hash partial → final on the
  * group key) and derives all windows group-locally from the tree. The
  * trade is group-level parallelism: with few distinct keys, pre-aggregate
  * per pane first (([[TimeWindows.slidingByPanes]]) and feed panes in —
  * the lift/comb here is pane-combinable by construction.
  *
  * Window membership matches the reference exactly: element with ts lands
  * in window ids [(ts-len) div slide + 1, ts div slide] (empty for hopping
  * gaps, wf/window_replica.hpp:267-273); only windows holding ≥1 element
  * are emitted (EOS-flush semantics of the batch rendering).
  */
case class FlatFatWindows(tsExpr: Expression, valExpr: Expression,
    lenUs: Long, slideUs: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FfatBuffer] {

  override def children: Seq[Expression] = Seq(tsExpr, valExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = FlatFatWindows.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (tsExpr.dataType == LongType && valExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"flatfat_windows expects (bigint ts, bigint value), got " +
        s"(${tsExpr.dataType}, ${valExpr.dataType})")

  override def createAggregationBuffer(): FfatBuffer =
    new FfatBuffer(new ArrayBuffer[Long], new ArrayBuffer[Long])

  override def update(b: FfatBuffer, input: InternalRow): FfatBuffer = {
    val t = tsExpr.eval(input)
    val v = valExpr.eval(input)
    if (t != null && v != null) {
      b.ts += t.asInstanceOf[Long]
      b.vs += v.asInstanceOf[Long]
    }
    b
  }

  override def merge(b: FfatBuffer, o: FfatBuffer): FfatBuffer = {
    b.ts ++= o.ts
    b.vs ++= o.vs
    b
  }

  override def eval(b: FfatBuffer): Any = {
    val out = FlatFatWindows.windows(b.ts.toArray, b.vs.toArray, lenUs, slideUs)
      .map(w => new GenericInternalRow(
        Array[Any](w.winStartUs, w.cnt, w.sum, w.min, w.max)): Any)
    new GenericArrayData(out)
  }

  override def serialize(b: FfatBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.ts.length * 16)
    bb.putInt(b.ts.length)
    var i = 0
    while (i < b.ts.length) { bb.putLong(b.ts(i)); bb.putLong(b.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FfatBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < k) { b.ts += bb.getLong; b.vs += bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FlatFatWindows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FlatFatWindows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(tsExpr = newChildren(0), valExpr = newChildren(1))
}

/** FlatFAT over PRE-COMBINED pane partials — the WLQ stage of the paned
  * feed ([[TimeWindows.slidingByFlatFatPaned]]): each input row is one
  * already-lifted (anchor_ts, cnt, sum, min, max) gcd-pane summary, so the
  * tree holds one leaf per PANE instead of one leaf per raw row
  * (/root/reference/wf/paned_windows.hpp:140-141 applied to the FlatFAT
  * tree of wf/flatfat.hpp). Output and window membership are identical to
  * [[FlatFatWindows]] over the raw rows (asserted in WindowsSpec) because
  * panes align with window boundaries and the lift/comb pair is
  * associative.
  */
case class FlatFatPartialWindows(tsExpr: Expression, cntExpr: Expression,
    sumExpr: Expression, mnExpr: Expression, mxExpr: Expression,
    lenUs: Long, slideUs: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FfatPartialBuffer] {

  override def children: Seq[Expression] = Seq(tsExpr, cntExpr, sumExpr, mnExpr, mxExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = FlatFatWindows.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"flatfat_partial_windows expects 5 bigint columns, got " +
        children.map(_.dataType).mkString("(", ", ", ")"))

  override def createAggregationBuffer(): FfatPartialBuffer =
    new FfatPartialBuffer(new ArrayBuffer[Long], new ArrayBuffer[Long],
      new ArrayBuffer[Long], new ArrayBuffer[Long], new ArrayBuffer[Long])

  override def update(b: FfatPartialBuffer, input: InternalRow): FfatPartialBuffer = {
    val t = tsExpr.eval(input); val c = cntExpr.eval(input)
    val s = sumExpr.eval(input); val mn = mnExpr.eval(input); val mx = mxExpr.eval(input)
    // an all-null pane (count(value)=0 over null values) contributes
    // nothing, matching the raw-row aggregate's null-skipping update
    if (t != null && c != null && s != null && mn != null && mx != null &&
        c.asInstanceOf[Long] > 0L) {
      b.ts += t.asInstanceOf[Long]; b.cnt += c.asInstanceOf[Long]
      b.sum += s.asInstanceOf[Long]; b.mn += mn.asInstanceOf[Long]
      b.mx += mx.asInstanceOf[Long]
    }
    b
  }

  override def merge(b: FfatPartialBuffer, o: FfatPartialBuffer): FfatPartialBuffer = {
    b.ts ++= o.ts; b.cnt ++= o.cnt; b.sum ++= o.sum; b.mn ++= o.mn; b.mx ++= o.mx
    b
  }

  override def eval(b: FfatPartialBuffer): Any = {
    val out = FlatFatWindows.windowsFromPartials(b.ts.toArray, b.cnt.toArray,
      b.sum.toArray, b.mn.toArray, b.mx.toArray, lenUs, slideUs)
      .map(w => new GenericInternalRow(
        Array[Any](w.winStartUs, w.cnt, w.sum, w.min, w.max)): Any)
    new GenericArrayData(out)
  }

  override def serialize(b: FfatPartialBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.ts.length * 40)
    bb.putInt(b.ts.length)
    var i = 0
    while (i < b.ts.length) {
      bb.putLong(b.ts(i)); bb.putLong(b.cnt(i)); bb.putLong(b.sum(i))
      bb.putLong(b.mn(i)); bb.putLong(b.mx(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FfatPartialBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val b = createAggregationBuffer()
    var i = 0
    while (i < k) {
      b.ts += bb.getLong; b.cnt += bb.getLong; b.sum += bb.getLong
      b.mn += bb.getLong; b.mx += bb.getLong
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FlatFatPartialWindows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FlatFatPartialWindows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(tsExpr = newChildren(0), cntExpr = newChildren(1), sumExpr = newChildren(2),
      mnExpr = newChildren(3), mxExpr = newChildren(4))
}

object FlatFatWindows {

  /** One non-empty window's combined lift values. */
  final case class Win(winStartUs: Long, cnt: Long, sum: Long, min: Long, max: Long)

  /** The FlatFAT kernel, shared by the batch aggregate ([[FlatFatWindows]])
    * and the streaming flavor ([[graft.streaming.StatefulOps.slidingWindowsFfat]]):
    * sorts (ts, v) pairs by ts, builds the implicit binary tree of
    * (cnt, sum, min, max) partials, and answers every non-empty window id
    * with an O(log n) range combine.
    */
  def windows(ts0: Array[Long], vs0: Array[Long], lenUs: Long,
      slideUs: Long): Array[Win] =
    windowsFromPartials(ts0, Array.fill(ts0.length)(1L), vs0, vs0, vs0,
      lenUs, slideUs)

  /** The kernel over PRE-COMBINED leaves: element i is an already-lifted
    * (cnt, sum, min, max) partial anchored at `ts0(i)`. The raw-row form
    * above is the cnt=1 special case; the pane-decomposed feed
    * ([[TimeWindows.slidingByFlatFatPaned]]) passes one gcd-pane partial
    * per leaf — valid because panes align with window boundaries (a pane
    * is entirely inside or outside every window) and the lift/comb pair
    * is associative, i.e. pane-combinable by construction
    * (/root/reference/wf/paned_windows.hpp:140-141 applied to the FlatFAT
    * tree).
    */
  def windowsFromPartials(ts0: Array[Long], cnt0: Array[Long],
      sum0: Array[Long], mn0: Array[Long], mx0: Array[Long],
      lenUs: Long, slideUs: Long): Array[Win] = {
    val m = ts0.length
    if (m == 0) return Array.empty
    // sort leaves by ts (stable order irrelevant: combine is commutative
    // across equal timestamps for cnt/sum/min/max)
    val order = (0 until m).sortBy(ts0)
    val ts = order.map(ts0).toArray
    // FlatFAT: implicit complete binary tree, leaves n..2n-1
    var n = 1
    while (n < m) n <<= 1
    val cnt = new Array[Long](2 * n)
    val sum = new Array[Long](2 * n)
    val mn = Array.fill(2 * n)(Long.MaxValue)
    val mx = Array.fill(2 * n)(Long.MinValue)
    var i = 0
    while (i < m) {
      val src = order(i)
      cnt(n + i) = cnt0(src); sum(n + i) = sum0(src)
      mn(n + i) = mn0(src); mx(n + i) = mx0(src)
      i += 1
    }
    var p = n - 1
    while (p >= 1) {
      val l = p << 1; val r = l | 1
      cnt(p) = cnt(l) + cnt(r)
      sum(p) = sum(l) + sum(r)
      mn(p) = math.min(mn(l), mn(r))
      mx(p) = math.max(mx(l), mx(r))
      p -= 1
    }
    // O(log n) range combine over [lo, hi)
    def query(lo0: Int, hi0: Int): (Long, Long, Long, Long) = {
      var lo = lo0 + n; var hi = hi0 + n
      var c = 0L; var s = 0L; var lmin = Long.MaxValue; var lmax = Long.MinValue
      while (lo < hi) {
        if ((lo & 1) == 1) {
          c += cnt(lo); s += sum(lo)
          lmin = math.min(lmin, mn(lo)); lmax = math.max(lmax, mx(lo))
          lo += 1
        }
        if ((hi & 1) == 1) {
          hi -= 1
          c += cnt(hi); s += sum(hi)
          lmin = math.min(lmin, mn(hi)); lmax = math.max(lmax, mx(hi))
        }
        lo >>= 1; hi >>= 1
      }
      (c, s, lmin, lmax)
    }
    def lowerBound(x: Long): Int = { // first idx with ts(idx) >= x
      var lo = 0; var hi = m
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ts(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }
    // window ids present: union of each element's [wmin, wmax] range,
    // deduped in one pass over the ts-sorted elements
    val wids = new ArrayBuffer[Long]()
    var lastAdded = Long.MinValue
    i = 0
    while (i < m) {
      val t = ts(i)
      val wMin = Math.floorDiv(t - lenUs, slideUs) + 1
      val wMax = Math.floorDiv(t, slideUs)
      var w = math.max(wMin, lastAdded + 1)
      while (w <= wMax) { wids += w; w += 1 }
      if (wMax > lastAdded) lastAdded = wMax
      i += 1
    }
    wids.map { w =>
      val lo = lowerBound(w * slideUs)
      val hi = lowerBound(w * slideUs + lenUs)
      val (c, s, lmin, lmax) = query(lo, hi)
      Win(w * slideUs, c, s, lmin, lmax)
    }.toArray
  }

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("win_start_us", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("sum_cents", LongType, nullable = false),
    StructField("min_cents", LongType, nullable = false),
    StructField("max_cents", LongType, nullable = false))), containsNull = false)

  def apply(ts: Column, v: Column, lenUs: Long, slideUs: Long): Column =
    Shim.column(new FlatFatWindows(Shim.expression(ts), Shim.expression(v),
      lenUs, slideUs).toAggregateExpression())

  /** Column surface of [[FlatFatPartialWindows]] (pane partials in). */
  def fromPartials(ts: Column, cnt: Column, sum: Column, mn: Column, mx: Column,
      lenUs: Long, slideUs: Long): Column =
    Shim.column(new FlatFatPartialWindows(Shim.expression(ts), Shim.expression(cnt),
      Shim.expression(sum), Shim.expression(mn), Shim.expression(mx),
      lenUs, slideUs).toAggregateExpression())
}
