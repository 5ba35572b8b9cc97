package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.dot
import graft.similarity.Similarity

/** IVF with real training: spherical Lloyd's k-means (monotone objective)
  * and multi-cell probing (monotone recall in nprobe). The declared
  * knn_ivf query keeps the deterministic stub centroids for oracle
  * exactness; these tests cover the trained/probed paths.
  */
class KMeansIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, TestSpark.SF)

  /** Mean best-cosine of every vector to its nearest centroid. */
  private def objective(cents: DataFrame): Double = {
    val c = broadcast(cents.select(col("cent_id"), col("cv"),
      sqrt(dot(col("cv"), col("cv"))).as("cn")))
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .crossJoin(c)
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("n") * col("cn")))
      .groupBy("vec_id").agg(max("ccos").as("best"))
      .agg(avg("best")).first().getDouble(0)
  }

  test("k-means objective is monotone: trained centroids beat the seed") {
    val seed = Similarity.firstKCentroids(emb, "vec_id", "embedding", 16)
      .select(col("cent_id"), col("cv").cast("array<double>").as("cv"))
    val trained = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 3)
    try {
      val o0 = objective(seed)
      val o3 = objective(trained)
      assert(o3 >= o0 - 1e-9, s"Lloyd iterations must not decrease the objective ($o0 -> $o3)")
      assert(trained.count() <= 16 && trained.count() > 0)
    } finally Caches.releaseAll()
  }

  test("banded knn recall dominates single-bucketing knn (coarser band-0 + extra tables)") {
    val truth = Similarity.knnBruteForce(
        emb.filter(col("vec_id") < 30), emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    // the 6-plane bucketing refines band 0's 4-plane bucketing (shared
    // plane family prefix), so banded candidates are a superset
    val single = recall(Similarity.knnLsh(emb, "vec_id", "embedding", k = 5,
      planes = 6, dim = 64, queryFilter = col("vec_id") < 30))
    val banded = recall(Similarity.knnLshBanded(emb, "vec_id", "embedding", k = 5,
      planes = 4, bands = 3, dim = 64, queryFilter = col("vec_id") < 30))
    assert(banded >= single, s"banded recall $banded must dominate single $single")
  }

  test("quantized k-means is deterministic and tracks the double-sum flavor") {
    try {
      val a = Similarity.kmeansCentroidsQuantized(emb, "vec_id", "embedding", 16, iters = 2)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      val b = Similarity.kmeansCentroidsQuantized(emb, "vec_id", "embedding", 16, iters = 2)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      // bit-identical across runs — integer sums are partition-order-free
      assert(a.toSeq == b.toSeq, "quantized centroids must be run-deterministic")
      assert(a.nonEmpty && a.length <= 16)
      // quantization error per dimension is < 1/scale + mean rounding
      val d = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 2)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      val maxDiff = a.flatMap { case (id, cv) =>
        d.get(id).toSeq.flatMap(dv => cv.zip(dv).map { case (x, y) => math.abs(x - y) })
      }.max
      assert(maxDiff < 1e-5, s"quantized centroids drifted from exact means: $maxDiff")
    } finally Caches.releaseAll()
  }

  test("nprobe recall is monotone and trained centroids work end-to-end") {
    val truth = Similarity.knnBruteForce(
        emb.filter(col("vec_id") < 30), emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int, cents: Option[DataFrame]): Double = {
      val got = Similarity.knnIvf(emb, "vec_id", "embedding", k = 5,
          numCentroids = 16, queryFilter = col("vec_id") < 30,
          centroids = cents, nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    try {
      val r1 = recall(1, None)
      val r3 = recall(3, None)
      assert(r3 >= r1, s"probing more cells must not lose recall ($r1 -> $r3)")
      val trained = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, iters = 2)
      val rt = recall(1, Some(trained))
      assert(rt > 0.0, "trained-centroid IVF must return meaningful neighbors")
    } finally Caches.releaseAll()
  }

  test("cellColumn ≡ ivfAssignWith: the key-preserving assignment is the same argmax") {
    try {
      val cents = Similarity.kmeansCentroidsQuantized(
        emb, "vec_id", "embedding", 16, 2)
      val viaColumn = emb.select(col("vec_id"),
          Similarity.cellColumn(col("embedding"), cents).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaAssign = Similarity.ivfAssignWith(emb, "vec_id", "embedding", cents)
        .select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaColumn == viaAssign)
    } finally Caches.releaseAll()
  }

  test("Rocchio prototypes: exact quantized class means, cosine value, argmax tie to lowest class") {
    import spark.implicits._
    // two labels, hand vectors: label 0 mean = (floor sums)/(scale·n)
    val rows = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.0, 1.0), 0),
      (3L, Seq(4.0, 0.0), 1)).toDF("vec_id", "v", "label")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"), col("label"))
    val cents = Similarity.classCentroids(rows, "label", "v")
    val got = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(got(0) == Seq(0.5, 0.5) && got(1) == Seq(4.0, 0.0))
    // bestCosColumn with ONE centroid is the cosine to it: (1,0)·(.5,.5)
    // / (1 · sqrt(.5)) = .5/sqrt(.5)
    val one = cents.filter(col("cent_id") === 0)
    val c = rows.filter(col("vec_id") === 1L)
      .select(Similarity.bestCosColumn(col("v"), one)).first().getDouble(0)
    assert(math.abs(c - 0.5 / math.sqrt(0.5)) < 1e-15)
    // argmax tie: query (1,1) has equal cosine to prototypes (1,0) and
    // (0,1) — the winner must be the LOWEST class id
    val tieC = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cent_id", "cv")
    val pred = Seq((9L, Seq(1.0, 1.0))).toDF("vec_id", "v")
      .select(Similarity.cellColumn(col("v").cast("array<double>"), tieC))
      .first().getInt(0)
    assert(pred == 0, "cosine tie must resolve to the lowest class")
    Caches.releaseAll()
  }

  test("semantic contamination: exact at nprobe=k, monotone recall, hits verify, serve path identical") {
    val bench = emb.filter(pmod(col("vec_id"), lit(41)) === 0)
    val tau = 0.3
    def hits(nprobe: Int): Map[Long, (Long, Long)] =
      Similarity.semanticContamination(emb, bench, "vec_id", "embedding",
          k = 16, iters = 2, nprobe = nprobe, threshold = tau)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    try {
      // probing ALL cells makes the candidate join exhaustive, so the
      // output must equal the brute-force cross-set τ-gate exactly
      val benchRows = bench.select(col("vec_id"),
          col("embedding").cast("array<double>")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val corpusRows = emb.select(col("vec_id"),
          col("embedding").cast("array<double>")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        def fold(xs: Seq[Double]): Double = xs.foldLeft(0.0)(_ + _)
        val ip = fold(a.indices.map(i => a(i) * b(i)))
        ip / (math.sqrt(fold(a.map(x => x * x))) *
          math.sqrt(fold(b.map(x => x * x))))
      }
      val brute = corpusRows.flatMap { case (cid, cv) =>
        val q = benchRows.filter { case (bid, bv) =>
          bid != cid && cos(bv, cv) >= tau }
        if (q.isEmpty) None
        else Some(cid -> ((q.map(_._1).min, q.size.toLong)))
      }.toMap
      val exhaustive = hits(nprobe = 16)
      assert(exhaustive == brute,
        "nprobe = k probes every cell: must equal brute force exactly")
      // recall is monotone in nprobe, and every reported hit is real
      val h1 = hits(1); val h3 = hits(3)
      assert(h1.keySet.subsetOf(h3.keySet) &&
        h3.keySet.subsetOf(exhaustive.keySet),
        "probing more cells must not lose contaminated vectors")
      h3.foreach { case (cid, (bid, n)) =>
        val (ebid, en) = exhaustive(cid)
        assert(n <= en && bid >= ebid,
          "per-vector hit evidence must be a subset of the exhaustive set")
      }
      // the serving split is the same relation pre-aggregation
      val cents = Similarity.kmeansCentroidsQuantized(
        emb, "vec_id", "embedding", 16, 2)
      val served = Similarity.semanticContaminationScored(
          emb, bench, cents, "vec_id", "embedding", nprobe = 3, threshold = tau)
        .groupBy("vec_id")
        .agg(min("bench_id").as("bench_id"), count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(served == h3, "serve-scored + aggregate must equal the batch row")
      // DISJOINT id spaces: with excludeSelf off, an accidental id
      // collision between a corpus vector and an eval item is a genuine
      // hit — the row must appear, not be silently suppressed
      val inclusive = Similarity.semanticContaminationScored(
          emb, bench, cents, "vec_id", "embedding", nprobe = 16,
          threshold = tau, excludeSelf = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bruteAll = corpusRows.flatMap { case (cid, cv) =>
        benchRows.collect { case (bid, bv) if cos(bv, cv) >= tau => (cid, bid) }
      }.toSet
      assert(inclusive == bruteAll,
        "excludeSelf=false must keep same-id cross-set hits")
      assert(bruteAll.exists { case (a, b) => a == b },
        "the fixture must exercise at least one id collision")
    } finally Caches.releaseAll()
  }
}
