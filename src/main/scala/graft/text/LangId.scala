package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableLog

/** TRAINED language identification — the CCNet/fastText front stage: a
  * K-class softmax (multinomial logistic regression) over hashed CHAR
  * n-gram presence features. The heuristic `TextAnalysis` langid columns
  * stay as cheap pre-filters; this is the model the per-language
  * perplexity buckets downstream actually key on.
  *
  * The [[QualityClassifier]] determinism recipe generalized to K
  * classes:
  *   - features: distinct char-[[GramN]]-gram buckets of the lowercased
  *     text ([[graft.functions.expressions.CharGramBuckets]] — one
  *     codegen'd pass; grams are codepoint windows so the DuckDB oracle
  *     replays them with `substr`) + a bias slot; presence-binarized,
  *     length-invariant;
  *   - each training round is ONE pass over the cached features: K
  *     margins via the native [[graft.functions.expressions
  *     .LrMarginFold]] kernel, softmax through the portable exponential
  *     (p_i = pexp(s_i) / Σ_j pexp(s_j), the Σ folded in CLASS ORDER —
  *     the one summation order every rendering shares), residuals
  *     r_i = p_i − [y = i], and the gradient QUANTIZED per
  *     (doc, class, bucket) — floor(r_i·c·10⁶) — then summed as int64:
  *     order-free, partitioning-independent, replayed round-by-round by
  *     the DuckDB oracle;
  *   - the driver folds ≤ K·(Buckets+1) gradient rows into the next W
  *     (policy-sized collect, never data);
  *   - prediction is argmax over the K margins with ties to the
  *     SMALLEST class index (a strictly-greater left fold — pinned, so
  *     the oracle's CASE chain picks identically).
  *
  * Round 1 needs no special casing: W = 0 gives pexp(0) = 1 exactly on
  * both engines, so p_i = 1/K as one IEEE division. At 100 TB: training
  * is R cached-feature passes with map-side-combined K·(B+1)-row
  * aggregations; scoring is a zero-shuffle pass over the features.
  */
object LangId {

  /** Hashed char-gram feature-space size; slot [[Buckets]] is the bias.
    * Wider than the quality classifier's 256 because char trigrams are
    * DENSE: a 1 kB document carries hundreds of distinct trigrams, and
    * under a small bucket space every doc saturates every bucket —
    * presence features then carry NO class signal (measured: 64 buckets
    * → all-one-class predictions at sf0.01). At 1024 the body text
    * covers ~40% of the space and the class-marker buckets stay
    * discriminative. */
  val Buckets: Int = 1024

  val GramN: Int = 3

  val GradScale: Double = 1.0e6
  val ScoreScale: Double = 1.0e6

  /** (η, R) tuned on the planted per-language vocabularies: separation
    * is already clean at 2 rounds for 3 classes at sf0.01 AND sf0.1
    * (100% planted accuracy, spec + declared rows) — softmax on
    * presence markers converges fast, and each extra round costs an
    * engine corpus pass AND 3 oracle pexp pyramids; policy constants —
    * the oracle replays whatever they are. */
  val Eta: Double = 2.0
  val Rounds: Int = 2

  /** K rows of Buckets+1 weights (last slot = bias). */
  final case class Model(w: Array[Array[Double]]) {
    def k: Int = w.length
  }

  /** Per-doc feature table (idCol, y, fx): sorted distinct char-gram
    * bucket structs (c = 1 presence) + the bias entry — per-row column
    * work, NO aggregation Exchange (the kernel emits the sorted distinct
    * buckets directly, unlike the token classifier's collect_set
    * shuffle). Callers cache it: it feeds every round and the scorer. */
  def features(corpus: DataFrame, idCol: String, textCol: String,
      labelCol: Column): DataFrame = {
    val bks = graft.functions.expressions.CharGramBuckets
      .of(lower(coalesce(col(textCol), lit(""))), GramN, Buckets)
    corpus.select(col(idCol), labelCol.cast("long").as("y"),
      concat(
        transform(bks, b => struct(b.as("b"), lit(1L).as("c"))),
        array(struct(lit(Buckets.toLong).as("b"), lit(1L).as("c")))).as("fx"))
  }

  private def marginCols(k: Int, w: Array[Array[Double]]): Seq[Column] =
    (0 until k).map(i =>
      graft.functions.expressions.LrMarginFold.of(col("fx"), typedLit(w(i).toSeq)))

  /** `rounds` of full-batch softmax GD from W = 0. */
  def train(feats: DataFrame, k: Int, rounds: Int = Rounds,
      eta: Double = Eta): Model = {
    require(k >= 2, s"softmax needs at least 2 classes: $k")
    val n = feats.count()
    require(n > 0, "language-ID needs a non-empty training corpus")
    var w = Array.fill(k, Buckets + 1)(0.0)
    for (_ <- 0 until rounds) {
      val es = marginCols(k, w).map(PortableLog.pexpCol)
      val tot = es.reduceLeft(_ + _) // class-ordered sum: ((e0+e1)+e2)…
      val rArr = array((0 until k).map(i =>
        es(i) / tot - (col("y") === i).cast("double")): _*)
      val rows = feats
        .select(rArr.as("rs"), explode(col("fx")).as("f"))
        .select(posexplode(col("rs")).as(Seq("k", "r")),
          col("f.b").as("b"), col("f.c").as("c"))
        .select(col("k"), col("b"),
          floor(col("r") * col("c").cast("double") * lit(GradScale))
            .cast("long").as("q"))
        .groupBy("k", "b").agg(sum(col("q")).as("g"))
        .collect()
      val grad = Array.fill(k, Buckets + 1)(0L)
      rows.foreach(r => grad(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
      w = Array.tabulate(k, Buckets + 1) { (i, b) =>
        w(i)(b) - eta * (grad(i)(b).toDouble / (GradScale * n.toDouble))
      }
    }
    Model(w)
  }

  /** Score the cached features: (id, lang, score_q) — lang = argmax
    * margin (ties → smallest class), score_q = floor(10⁶·s_argmax). */
  def score(feats: DataFrame, idCol: String, m: Model): DataFrame = {
    val ms = marginCols(m.k, m.w)
    val (bs, bk) = ms.zipWithIndex.tail.foldLeft((ms.head, lit(0))) {
      case ((cs, ck), (s, i)) =>
        (when(s > cs, s).otherwise(cs), when(s > cs, lit(i)).otherwise(ck))
    }
    feats.select(col(idCol), bk.cast("int").as("lang"),
      floor(lit(ScoreScale) * bs).cast("long").as("score_q"))
  }

  /** Persist through [[graft.pipeline.ModelStore]] — (class, index,
    * weight) rows; parquet DOUBLEs round-trip bit-exactly. */
  def save(spark: org.apache.spark.sql.SparkSession, m: Model,
      root: String): Long = {
    import spark.implicits._
    graft.pipeline.ModelStore.save(spark, root,
      Seq("weights" -> m.w.toSeq.zipWithIndex.flatMap { case (wk, i) =>
        wk.toSeq.zipWithIndex.map { case (v, b) => (i, b, v) }
      }.toDF("k", "i", "w").coalesce(1)),
      Map("classes" -> m.k.toString))
  }

  def load(spark: org.apache.spark.sql.SparkSession, root: String): Model = {
    val k = graft.pipeline.ModelStore.loadParams(spark, root)("classes").toInt
    val rows = graft.pipeline.ModelStore.loadRelation(spark, root, "weights")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    require(rows.size == k * (Buckets + 1),
      s"expected ${k * (Buckets + 1)} weights, loaded ${rows.size}")
    Model(Array.tabulate(k, Buckets + 1)((i, b) => rows((i, b))))
  }
}
