package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's FlatFAT window-aggregation contract
  * (/root/reference/wf/flatfat.hpp:30-34, citing Tangwongsan et al.
  * VLDB'15): user supplies `lift: tuple → partial` and an associative
  * `comb: (partial, partial) → partial`; the engine reuses partials across
  * overlapping windows.
  *
  * In Spark the same contract is `Aggregator[IN, BUF, OUT]`: lift ≡
  * `reduce` (fold one input into the buffer), comb ≡ `merge`. Catalyst
  * then plans partial→final aggregation — the work-sharing the FlatFAT
  * tree provides within one replica, Spark provides across
  * partitions/cores; pane decomposition
  * ([[TimeWindows.slidingByPanes]]) adds the cross-window sharing for
  * sliding windows. The spec asserts lift/comb results equal direct
  * aggregation (the reference's correctness property for Ffat_Windows vs
  * Keyed_Windows).
  */
class LiftCombAggregator[IN, BUF, OUT](
    z: BUF,
    lift: IN => BUF,
    comb: (BUF, BUF) => BUF,
    present: BUF => OUT)(implicit bufEnc: Encoder[BUF], outEnc: Encoder[OUT])
  extends Aggregator[IN, BUF, OUT] {

  override def zero: BUF = z
  override def reduce(b: BUF, a: IN): BUF = comb(b, lift(a))
  override def merge(b1: BUF, b2: BUF): BUF = comb(b1, b2)
  override def finish(reduction: BUF): OUT = present(reduction)
  override def bufferEncoder: Encoder[BUF] = bufEnc
  override def outputEncoder: Encoder[OUT] = outEnc
}

object LiftCombAggregator {
  /** (sum, count, min, max) over Long values — the reference win_tests'
    * canonical lift/comb logic shape.
    */
  def sumCountMinMax: LiftCombAggregator[Long, (Long, Long, Long, Long), (Long, Long, Long, Long)] = {
    implicit val t4: Encoder[(Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    new LiftCombAggregator[Long, (Long, Long, Long, Long), (Long, Long, Long, Long)](
      (0L, 0L, Long.MaxValue, Long.MinValue),
      v => (v, 1L, v, v),
      (a, b) => (a._1 + b._1, a._2 + b._2, math.min(a._3, b._3), math.max(a._4, b._4)),
      identity)
  }
}
