package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** The reference's core test invariant, transplanted: results are
  * independent of parallelism and scheduling
  * (/root/reference/tests/graph_tests/test_graph_1.cpp:86-99,188-196 —
  * randomized parallelism 1-9 must reproduce the same global result).
  * Here: identical results across shuffle-partition settings.
  */
class InvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val probes = Seq("win_cb_tumbling", "reduce_rolling", "dedup_minhash_lsh",
    "win_tb_sliding", "interval_join",
    // the pane-fed FlatFAT and the prefix-scan-based example packing both
    // depend on partition-boundary bookkeeping — exactly what this spec
    // exists to pin
    "win_tb_sliding_ffat_paned", "pipeline_pack_examples")

  test("results invariant under shuffle partitions {1, 5, 9}") {
    val results = Seq(1, 5, 9).map { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try probes.map(q => q -> canon(SparkEntry.queries(q)(spark, TestSpark.SF))).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    probes.foreach { q =>
      assert(results(0)(q) == results(1)(q), s"$q differs between 1 and 5 partitions")
      assert(results(0)(q) == results(2)(q), s"$q differs between 1 and 9 partitions")
    }
  }

  test("BPE training is invariant under shuffle partitions") {
    // the best-pair selection is a global orderBy().limit(1) over a
    // partial→final count aggregate — exactly the shape where an
    // incomplete tiebreak (count only) would let partition scheduling
    // pick different-but-equal-count pairs on different runs; the
    // (count DESC, pair ASC) total order must make every round's choice,
    // and therefore the whole merge table and final state, identical
    val runs = Seq(1, 7).map { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try {
        val (merges, state) = graft.text.Bpe.train(
          Tables.documents(spark, TestSpark.SF), "doc_id", "text", rounds = 4)
        val out = (merges, canon(state))
        Caches.releaseAll()
        out
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(runs(0)._1 == runs(1)._1, "merge tables differ across partitionings")
    assert(runs(0)._2 == runs(1)._2, "final states differ across partitionings")
    assert(runs(0)._1.size == 4)
  }
}
