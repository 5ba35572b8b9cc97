package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.pipeline.ModelStore

/** Drift-gated IVF-PQ refresh (r13 judge #7). The declared rows pin the
  * two gate OUTCOMES by hash (refresh-all ≡ from-scratch; zero drift ≡
  * no-op); this spec pins the PARTIAL path the oracle can't see — a
  * corpus whose slice-0 distribution shifts while the other slices are
  * constant must refit ONLY the drifted components, carrying every
  * undrifted codebook over byte-identical.
  */
class PqRefreshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 64
  private val Sub = 16 // 4 books of 16 dims

  /** vec = slice0 pattern ++ the SAME fixed pattern on slices 1-3 (so
    * books 1-3 see one distinct slice value corpus-wide — their code
    * occupancy is a single bin whatever the corpus, smoothed PSI exactly
    * 0). slice0 alternates between two patterns by `sel`. */
  private def vec(sel: Int): Seq[Float] = {
    val s0 =
      if (sel == 0) Seq.tabulate(Sub)(j => 1.0f + j * 0.25f)
      else Seq.tabulate(Sub)(j => -2.0f + j * 0.5f)
    val fixed = Seq.tabulate(Sub)(j => 0.5f + (j % 3) * 0.75f)
    s0 ++ fixed ++ fixed ++ fixed
  }

  test("partial refresh: only drift-flagged components refit; undrifted books carry byte-identical") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-test-pqrefresh-" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      // base corpus: slice0 pattern 0 on 3/4 of vectors, pattern 1 on 1/4
      val base = (0L until 40L).map(i => (i, vec(if (i % 4 == 0) 1 else 0)))
        .toDF("vec_id", "embedding")
      // new corpus: the slice0 MIX inverts (3/4 pattern 1) — book 0's code
      // occupancy shifts hard; books 1-3 still see their single value
      val next = (0L until 40L).map(i => (i, vec(if (i % 4 == 0) 0 else 1)))
        .toDF("vec_id", "embedding")
      Similarity.pqSave(spark, root, base, "vec_id", "embedding",
        numCentroids = 4, iters = 2, subvectors = 4, codes = 4, dim = Dim)
      val gen0 = ModelStore.latestGen(spark, root).get

      val report = Similarity.pqDriftReport(spark, root, next,
        "vec_id", "embedding")
      assert((1 to 3).forall(i => report(s"book_$i") == 0L),
        s"constant slices must show exactly zero drift: $report")
      assert(report("book_0") > 0L,
        s"the inverted slice-0 mix must drift book 0: $report")

      val booksBefore = ModelStore.loadRelation(spark, root, "books")
        .orderBy("m", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](3)))

      // gate 0: book 0 (and coarse iff its occupancy moved) refit
      val (served, rep2) = Similarity.pqRefresh(spark, root, next,
        "vec_id", "embedding", gateQ = 0L)
      assert(rep2 == report)
      assert(served > gen0, "drift above the gate must commit a new generation")

      val booksAfter = ModelStore.loadRelation(spark, root, "books")
        .orderBy("m", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](3)))
      val before = booksBefore.groupBy(_._1)
      val after = booksAfter.groupBy(_._1)
      (1 to 3).foreach { i =>
        assert(before(i).toSeq == after(i).toSeq,
          s"undrifted book $i must carry over byte-identical")
      }
      // book 0 refit on `next` must equal training that slice from
      // scratch on `next` (the byte-identity that lets refresh-all share
      // the from-scratch oracle)
      val scratch = Similarity.pqCodebooksSubset(next, "vec_id", "embedding",
        subvectors = 4, codes = 4, iters = 2, dim = Dim, only = Seq(0))(0)
      assert(after(0).toSeq.map(x => (x._2, x._3)) ==
        scratch.zipWithIndex.map { case ((_, cv), pos) => (pos, cv) },
        "refit book must equal the from-scratch book on the same corpus")

      // idempotence: a second refresh sees its own occupancy → no-op
      val (served2, rep3) = Similarity.pqRefresh(spark, root, next,
        "vec_id", "embedding", gateQ = 0L)
      assert(served2 == served && rep3.values.forall(_ == 0L),
        s"refresh against its own baseline must be a no-op: $rep3")
    } finally {
      Caches.releaseAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
