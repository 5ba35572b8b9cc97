package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Pipe

case class KV(key: Long, value: Long, ts: Long)

/** The fluent facade: stateless ops, merge, split multicast, keyed rolling
  * reduce (reference builder/MultiPipe surface, SURVEY §3).
  */
class PipeApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pipe: Pipe[KV] = {
    import spark.implicits._
    Pipe(spark.createDataset((1L to 100L).map(i => KV(i % 5, i, i))))
  }

  test("map / filter / flatMap compose") {
    import spark.implicits._
    val out = pipe
      .map(kv => kv.copy(value = kv.value * 2))
      .filter(_.value % 4 == 0)
      .flatMap(kv => Seq(kv.value, kv.value + 1))
      .ds.collect().sorted
    assert(out.length == 100 && out.head == 4L)
  }

  test("merge unions pipes; split multicasts") {
    import spark.implicits._
    val p = pipe
    val Seq(hi, lo) = p.split(_.value > 50, _.value <= 60) // overlap 51..60
    assert(hi.merge(lo).ds.count() == 110) // 50 + 60: multicast duplicates
  }

  test("rollingReduce emits updated state per input (reference Reduce)") {
    import spark.implicits._
    val out = pipe.keyBy(_.key)
      .rollingReduce(0L)((s, t) => s + t.value)(t => (t.ts, t.value))
      .ds.collect()
    assert(out.length == 100) // one emission per input
    val finalPerKey = out.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val want = (1L to 100L).groupBy(_ % 5).map { case (k, vs) => k -> vs.sum }
    assert(finalPerKey == want)
  }

  test("riched map sees partition context") {
    import spark.implicits._
    val replicas = pipe.mapRiched((kv, ctx) => ctx.replicaIndex).ds.distinct().collect()
    assert(replicas.nonEmpty && replicas.forall(_ >= 0))
  }
}
