package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): score every raw document by the log-likelihood ratio of two
  * bag-of-hashed-n-gram unigram models, one fit on a small TARGET corpus
  * (the distribution you want more of) and one on the RAW corpus, then
  * keep the top slice. The WindFlow reference has no analog — this is one
  * of the LLM-pipeline extras (SURVEY §8.8); the published method is the
  * spec.
  *
  * Distributed shape (the 100 TB story):
  *   - features are unigrams+bigrams (with multiplicity) hashed into
  *     [[Buckets]] buckets — the feature space is a POLICY dimension,
  *     fixed and tiny, not data-sized;
  *   - fitting is ONE aggregation over the exploded gram stream (map-side
  *     partial counts, one Exchange on the bucket id) followed by a
  *     ≤[[Buckets]]-row collect — the same "policy-dimension collect" as
  *     the temperature-mix weights and IVF centroids;
  *   - scoring is ZERO-shuffle pure column work: the per-bucket quantized
  *     log-ratios ride along as a plan-literal array, and each document
  *     folds `qlr(bucket(gram))` over its gram array (one md5 per gram —
  *     the op's intrinsic cost); an integer sum, so order-free and exact.
  *
  * Cross-engine determinism: the log-likelihood ratio needs a logarithm,
  * and `ln` is NOT reproducible across engines (Java's Math.log and
  * DuckDB's libm may differ in the last ulp, and a quantizing `floor`
  * amplifies an ulp into an off-by-one). Instead the model is defined in
  * terms of [[plog]], a fixed dag of CORRECTLY-ROUNDED IEEE-754 ops
  * (+, −, ×, ÷, sqrt are all exactly specified by IEEE): both engines
  * execute the identical op sequence on identical rational inputs and
  * produce bit-identical doubles — the same doctrine as the in-order
  * double folds in [[graft.oracle.DuckSql]]. plog approximates ln to
  * ~1e-8 relative (spec-asserted), which is fidelity headroom, not a
  * correctness requirement: determinism comes from the shared dag.
  */
object Dsir {

  /** Hashed feature-space size. The paper uses 10⁴; any fixed power of
    * two works — what matters at scale is that it is a constant, so the
    * fitted model is O(Buckets) however big the corpus is.
    */
  val Buckets: Int = 1024

  /** Fixed-point scale for the per-bucket quantized log-ratio. */
  val QlrScale: Double = 1.0e6

  /** The engine's portable logarithm — see
    * [[graft.functions.PortableLog]] (one definition, three renderings;
    * DSIR was its first caller, the n-gram LM scorer its second). These
    * delegates keep DSIR's call sites/oracle builders reading locally.
    */
  def plog(x: Double): Double = graft.functions.PortableLog.plog(x)

  def plogSqrtNestSql(x: String): String =
    graft.functions.PortableLog.sqrtNestSql(x)

  def plogZSql(y: String): String = graft.functions.PortableLog.zSql(y)

  def plogSeriesSql(z: String): String =
    graft.functions.PortableLog.seriesSql(z)

  /** Fitted model: per-bucket quantized log-ratio (target vs raw), plus
    * the raw counts for test/diagnostic use. qlr(b) =
    * floor(QlrScale · (plog((ct+1)/(nt+B)) − plog((cr+1)/(nr+B)))) —
    * add-one smoothing over the B-bucket space, exactly the paper's
    * estimator with plog as the engine's logarithm.
    */
  final case class Model(qlr: Array[Long], ct: Array[Long], cr: Array[Long],
      nt: Long, nr: Long)

  /** Unigrams + bigrams WITH multiplicity — the paper's feature stream.
    * Tokenization is evaluated a constant number of times per row
    * (shifted-slice bigrams, no lambda-embedded re-tokenization).
    * NULL text reads as empty (→ zero grams → the documented (0, 0)
    * score): a PERMISSIVE JSONL line can parse clean yet lack the text
    * field, and `concat` of a NULL token array would otherwise poison
    * the whole gram column to NULL.
    */
  def gramsCol(text: Column): Column = {
    val t = tokens(coalesce(text, lit("")))
    concat(t, wordGramsFromTokens(t, 2))
  }

  /** Gram → feature bucket; hash60 is md5-based and positive, so `pmod`
    * here and `%` in DuckDB agree.
    */
  def bucketCol(gram: Column): Column = pmod(hash60(gram), lit(Buckets.toLong))

  /** Fit target & raw gram models in ONE pass: explode grams, count per
    * bucket overall (raw model) and under `targetPred` (target model),
    * collect ≤ Buckets rows. The quantized log-ratio is computed
    * driver-side with [[plog]]; the DuckDB oracle re-derives the whole
    * model (counts AND plog) from the same relation, so a count or
    * rounding divergence anywhere fails the hash.
    */
  def fit(corpus: DataFrame, textCol: String, targetPred: Column): Model = {
    val rows = corpus
      .select(targetPred.as("is_t"), explode(gramsCol(col(textCol))).as("gram"))
      .select(col("is_t"), bucketCol(col("gram")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val ct = new Array[Long](Buckets)
    val cr = new Array[Long](Buckets)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      cr(b) = r.getLong(1)
      ct(b) = r.getLong(2)
    }
    modelFromCounts(ct, cr)
  }

  /** Derive (totals, quantized log-ratios) from bucket counts — the tail
    * of [[fit]], shared by [[merge]] so a merged model quantizes through
    * the identical dag. */
  def modelFromCounts(ct: Array[Long], cr: Array[Long]): Model = {
    require(ct.length == Buckets && cr.length == Buckets,
      s"count arrays must be $Buckets-bucket")
    val nt = ct.sum
    val nr = cr.sum
    val qlr = Array.tabulate(Buckets) { b =>
      val gt = plog((ct(b) + 1L).toDouble / (nt + Buckets).toDouble)
      val gr = plog((cr(b) + 1L).toDouble / (nr + Buckets).toDouble)
      math.floor(QlrScale * (gt - gr)).toLong
    }
    Model(qlr, ct, cr, nt, nr)
  }

  /** Merge two models fitted over DISJOINT corpus slices (same
    * targetPred semantics): bucket counts and totals are order-free
    * integer sums, so the merged counts equal a [[fit]] on the union and
    * the re-derived qlr is bit-identical to the union fit's — merge ≡
    * refit, which is what lets a nightly increment fold into last
    * night's ModelStore generation without a corpus rescan. */
  def merge(a: Model, b: Model): Model =
    modelFromCounts(
      Array.tabulate(Buckets)(i => a.ct(i) + b.ct(i)),
      Array.tabulate(Buckets)(i => a.cr(i) + b.cr(i)))

  /** Score every document: (id, n_grams, dsir_score) where dsir_score =
    * Σ over the doc's grams of qlr(bucket(gram)) — an exact integer fold,
    * zero shuffle: ONE pass of the native
    * [[graft.functions.expressions.DsirScore]] kernel per row (tokenize
    * once, hash every gram once, O(1) array lookup per gram; the model
    * rides as one plan-literal array). Value-identical to the
    * `aggregate(grams, …)` higher-order fold it replaced — that lambda
    * ran as CodegenFallback with the md5 interpreted per gram, the same
    * defect class the entropy/CDC/BM25 kernels fixed. Zero-gram docs
    * score (0, 0); NULL text reads as empty (the [[gramsCol]] rule).
    */
  def score(corpus: DataFrame, idCol: String, textCol: String, m: Model): DataFrame = {
    val qarr = typedLit(m.qlr.toSeq)
    corpus
      .select(col(idCol),
        graft.functions.expressions.DsirScore
          .of(coalesce(col(textCol), lit("")), qarr).as("__s"))
      .select(col(idCol),
        col("__s.n_grams").as("n_grams"),
        col("__s.dsir_score").as("dsir_score"))
  }

  /** Persist a fitted model through [[graft.pipeline.ModelStore]]: one
    * (bucket, qlr, ct, cr) row per feature bucket plus the two totals —
    * all exact integers, so the round trip is value-exact and the loaded
    * row scores against the SAME oracle as the inline fit. Returns the
    * committed generation. */
  def save(spark: org.apache.spark.sql.SparkSession, m: Model,
      root: String): Long = {
    import spark.implicits._
    graft.pipeline.ModelStore.save(spark, root,
      Seq("model" -> (0 until Buckets)
        .map(b => (b, m.qlr(b), m.ct(b), m.cr(b)))
        .toDF("bucket", "qlr", "ct", "cr").coalesce(1)),
      Map("nt" -> m.nt.toString, "nr" -> m.nr.toString))
  }

  def load(spark: org.apache.spark.sql.SparkSession, root: String): Model = {
    import graft.pipeline.ModelStore
    val p = ModelStore.loadParams(spark, root)
    val qlr = new Array[Long](Buckets)
    val ct = new Array[Long](Buckets)
    val cr = new Array[Long](Buckets)
    val rows = ModelStore.loadRelation(spark, root, "model").collect()
    require(rows.length == Buckets, s"expected $Buckets buckets, loaded ${rows.length}")
    rows.foreach { r =>
      val b = r.getInt(0)
      qlr(b) = r.getLong(1); ct(b) = r.getLong(2); cr(b) = r.getLong(3)
    }
    Model(qlr, ct, cr, p("nt").toLong, p("nr").toLong)
  }

  /** Top-k selection by (dsir_score DESC, id ASC) — the deterministic
    * top-slice variant of the paper's resampling step. Distributed top-k
    * via the two-pass prefix rank (range-partition on the order key,
    * per-partition ranks + driver offset join): no global sort collapse,
    * no TakeOrdered collect of k rows to the driver (k is a corpus
    * fraction — unbounded at 100 TB).
    */
  def selectTopK(scored: DataFrame, idCol: String, k: Long): DataFrame = {
    val ranked = graft.operators.PrefixSum.runningSum(
      scored.withColumn("__one", lit(1L))
        .withColumn("__neg", -col("dsir_score")),
      "__one", Seq("__neg", idCol))
    ranked.filter(col("running___one") <= k)
      .drop("__one", "__neg", "running___one")
  }
}
