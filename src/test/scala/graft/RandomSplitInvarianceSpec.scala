package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EvRow, StatefulOps}

/** The reference's randomized-run discipline, applied to micro-batch
  * splits: the same input stream delivered in random chunkings must
  * produce identical final results
  * (/root/reference/tests/graph_tests/test_graph_1.cpp:86-99 randomizes
  * parallelism/batching per run and aborts on any difference;
  * FIXTURES.md §2 maps that to "trigger chunkings and input micro-batch
  * splits").
  */
class RandomSplitInvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rolling reduce is invariant under random micro-batch splits (seeded)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Tables.events(spark, TestSpark.SF)
      .selectExpr("event_id", "user_id", "ts div 1000 AS ts_us",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .as[EvRow].collect().sortBy(e => (e.ts_us, e.event_id)).toSeq

    def run(chunks: Seq[Seq[EvRow]], name: String): Map[Long, (Double, Long)] = {
      val mem = MemoryStream[EvRow]
      val q = StatefulOps.rollingReduce(mem.toDS())(spark).toDF()
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
    }

    val rnd = new scala.util.Random(42)
    val reference = run(Seq(rows), "split_ref")
    (1 to 3).foreach { i =>
      // random cut points → 2-6 chunks
      val nCuts = 1 + rnd.nextInt(5)
      val cuts = (Seq(0, rows.size) ++ Seq.fill(nCuts)(rnd.nextInt(rows.size)))
        .distinct.sorted
      val chunks = cuts.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }.toSeq
      val got = run(chunks, s"split_$i")
      assert(got == reference, s"chunking $i (${chunks.map(_.size)}) diverged")
    }
  }
}
