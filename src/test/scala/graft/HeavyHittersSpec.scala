package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.CorpusStats

/** Sketch-guided exact heavy hitters: hand-checked output, merge/shrink
  * correctness under real eviction pressure (local type count well above
  * the counter budget, 20-way partial merge), and partitioning-invariance
  * of the final exact set.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact head by hand: output is {token : count ≥ N div (m+1) + 1}") {
    import spark.implicits._
    // 40 'a', 30 'b', 8 'c', 22 singletons → N = 100; m = 4 → T = 21
    val text = (Seq.fill(40)("a") ++ Seq.fill(30)("b") ++ Seq.fill(8)("c") ++
      (1 to 22).map(i => s"u$i")).mkString(" ")
    val got = CorpusStats.heavyHitters(Seq((1L, text)).toDF("doc_id", "text"),
      "text", m = 4).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 40L, "b" -> 30L), "c (8 < T=21) must not appear")
  }

  test("20-way merge under eviction pressure keeps the exact head") {
    import spark.implicits._
    // 20 partitions, 13 local types vs m = 8 counters → every partial
    // evicts; per partition the heavy token appears 8× among 12 fillers
    // (4× each, partition-local names). Globally: heavy = 160,
    // N = 20·(8+48) = 1120, T = 1120 div 9 + 1 = 125 → exactly {heavy}.
    // (MG's guarantee makes this safe by construction: heavy's local
    // count 8 exceeds the local bound 56/9, so every partial retains it;
    // the test exercises shrink() on update AND on the 20-way merge.)
    val rows = (0 until 20).flatMap { p =>
      val fillers = (0 until 12).flatMap(f => Seq.fill(4)(s"f${p}_$f"))
      (Seq.fill(8)("heavy") ++ fillers).map(t => (p, t))
    }
    val docs = rows.zipWithIndex
      .map { case ((p, t), i) => (i.toLong, p, t) }
      .toDF("doc_id", "part", "text")
      .repartition(20, col("part"))
    val got = CorpusStats.heavyHitters(docs, "text", m = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("heavy" -> 160L))
  }

  test("ingestion fold: multi-batch merge ends in the batch-exact head with O(m) state per trigger") {
    import spark.implicits._
    implicit val sp = spark
    // same distribution as the invariance test, delivered as SIX
    // micro-batches (one file per trigger): the cross-batch fold must
    // end in exactly the batch operator's head — batch-split
    // independence, the streaming analog of partitioning invariance —
    // while the running sketch never exceeds m counters at any trigger
    val docs = ((1 to 200).map(_ => "alpha") ++ (1 to 150).map(_ => "beta") ++
      (1 to 650).map(i => s"tail$i")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-stream").toString
    try {
      docs.repartition(6).write.mode("overwrite").parquet(dir)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val batches = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      val got = CorpusStats.heavyHittersIngest(stream,
          spark.read.parquet(dir), "text", m = 8,
          onBatch = (sz, n) => { batches += ((sz, n)); () })
        .orderBy("token").collect().map(_.toSeq).toSeq
      val want = CorpusStats.heavyHitters(docs, "text", m = 8)
        .orderBy("token").collect().map(_.toSeq).toSeq
      assert(got == want, "ingestion head must equal the batch head")
      assert(got.map(_.head) == Seq("alpha", "beta"))
      assert(batches.size >= 6,
        s"expected one trigger per file (6), saw ${batches.size}")
      assert(batches.forall(_._1 <= 8),
        s"sketch state exceeded m counters: $batches")
      assert(batches.map(_._2).max == 1000L, "running N must total the stream")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ingestion fold: crash after the state commit resumes without double-counting") {
    import spark.implicits._
    implicit val sp = spark
    // the sketch is DRIVER state — without persistence a restart forgets
    // every batch the checkpoint says are done. With stateDir set, the
    // fold persists after each merge; the injected crash lands in the
    // nastiest window (state committed, offset NOT committed), so the
    // replayed batch must be SKIPPED on resume or alpha/beta would
    // double-count, shifting both the threshold and the head counts.
    val docs = ((1 to 200).map(_ => "alpha") ++ (1 to 150).map(_ => "beta") ++
      (1 to 650).map(i => s"tail$i")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-hh-resume").toString
    try {
      val staging = s"$root/staging"
      docs.repartition(6).write.mode("overwrite").parquet(staging)
      def stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)
      val archive = spark.read.parquet(staging)
      var calls = 0
      val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        graft.text.CorpusStats.heavyHittersIngest(stream, archive, "text", m = 8,
          onBatch = (_, _) => {
            calls += 1
            if (calls == 2) throw new RuntimeException("injected crash after fold")
            ()
          },
          checkpoint = Some(s"$root/ckpt"), stateDir = Some(s"$root/state"))
      }
      assert(crashed.getMessage.contains("injected crash") ||
        crashed.getCause.getMessage.contains("injected crash"))
      // resume from the same checkpoint + state: batch 1 replays but its
      // merge is skipped (already in the persisted fold); 2..5 complete
      var ns = List.empty[Long]
      val got = graft.text.CorpusStats.heavyHittersIngest(stream, archive,
          "text", m = 8,
          onBatch = (_, n) => { ns = n :: ns; () },
          checkpoint = Some(s"$root/ckpt"), stateDir = Some(s"$root/state"))
        .orderBy("token").collect().map(_.toSeq).toSeq
      val want = CorpusStats.heavyHitters(docs, "text", m = 8)
        .orderBy("token").collect().map(_.toSeq).toSeq
      assert(got == want, "resumed head must equal the batch head")
      assert(ns.max == 1000L,
        s"running N must end exact (no double-count): ${ns.sorted}")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("final set is partitioning-invariant (sketch only prunes)") {
    import spark.implicits._
    // one token per doc so repartitioning genuinely respreads the stream
    val docs = ((1 to 200).map(_ => "alpha") ++ (1 to 150).map(_ => "beta") ++
      (1 to 650).map(i => s"tail$i")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val a = CorpusStats.heavyHitters(docs.repartition(1), "text", m = 8)
      .orderBy("token").collect().map(_.toSeq).toSeq
    val b = CorpusStats.heavyHitters(docs.repartition(13), "text", m = 8)
      .orderBy("token").collect().map(_.toSeq).toSeq
    assert(a == b)
    // N = 1000, m = 8 → T = 112: alpha (200) and beta (150) qualify
    assert(a.map(_.head) == Seq("alpha", "beta"))
  }

  test("grouped head: exact per-group thresholds, no cross-group bleed, partitioning-invariant") {
    import spark.implicits._
    // g0: 40 'hot' + 60 fillers (N=100, m=4 → T=21) → {hot: 40}
    // g1: 'hot' only 10× + 50 'cold' + 40 fillers (T=21) → {cold: 50} —
    //     'hot' is heavy in g0 but must NOT leak into g1's head
    // g2: 30 uniques (T=7) → empty head
    val rows =
      (Seq.fill(40)(("g0", "hot")) ++ (1 to 60).map(i => ("g0", s"f0_$i")) ++
       Seq.fill(10)(("g1", "hot")) ++ Seq.fill(50)(("g1", "cold")) ++
         (1 to 40).map(i => ("g1", s"f1_$i")) ++
       (1 to 30).map(i => ("g2", s"f2_$i")))
    val docs = rows.zipWithIndex
      .map { case ((g, t), i) => (i.toLong, g, t) }.toDF("doc_id", "grp", "text")
    def head(parts: Int) = CorpusStats.heavyHittersBy(
        docs.repartition(parts), "grp", "text", m = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = head(1)
    assert(got == Map(("g0", "hot") -> 40L, ("g1", "cold") -> 50L))
    assert(head(17) == got, "grouped head must be partitioning-invariant")
    // and the grouped operator agrees with the ungrouped one per slice
    for (g <- Seq("g0", "g1", "g2")) {
      val slice = CorpusStats.heavyHitters(
          docs.filter(col("grp") === g), "text", m = 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val mine = got.collect { case ((`g`, t), c) => t -> c }.toMap
      assert(mine == slice, s"group $g must match its own slice")
    }
  }
}
