package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.functions.PortableLog

/** Model-based quality filtering — the GPT-3/LLaMA recipe: train a
  * logistic-regression classifier on bag-of-hashed-token features with a
  * curated corpus as the positive class, score every raw document, keep
  * the high scorers. (GPT-3 used LR over tf-idf features with WebText as
  * positives; fastText quality classifiers are the same shape.)
  *
  * Distributed training at the engine's determinism standard — full-batch
  * gradient descent as Lloyd-style rounds:
  *   - features: token counts hashed into [[Buckets]] buckets + a bias
  *     slot — a POLICY dimension, so the model is O(Buckets) at any
  *     corpus size; per-doc features are built ONCE ((id, bucket)
  *     aggregation → sorted struct array, cached);
  *   - each round is ONE corpus pass: margin s_d = in-order fold of
  *     w[b]·c over the doc's SORTED feature array (deterministic order),
  *     p_d = psig(s_d) via the portable sigmoid ([[PortableLog.psig]] —
  *     a fixed dag of correctly-rounded IEEE ops, so every engine
  *     computes the same double), and the gradient is QUANTIZED per
  *     (doc, bucket) — floor((p−y)·c·1e6) — then summed as int64:
  *     order-free, partitioning-independent, exactly reproducible by the
  *     DuckDB oracle's round-by-round replay;
  *   - the driver folds the ≤ Buckets+1 gradient sums into the next w
  *     (the policy-dimension collect; never data).
  *
  * Scoring is a zero-shuffle pass over the cached features (batch) or a
  * direct per-row presence fold (streaming — no feature aggregation, no
  * state; see [[scorePresenceFold]]).
  */
object QualityClassifier {

  /** Hashed feature-space size; slot [[Buckets]] is the bias. */
  val Buckets: Int = 256

  /** Fixed-point scale for per-(doc,bucket) gradient quantization. */
  val GradScale: Double = 1.0e6

  /** Fixed-point scale for the emitted margin (`score_q`); every scorer
    * and every composite quantizing a margin must use this constant.
    */
  val ScoreScale: Double = 1.0e6

  /** η = 2.0 over 6 rounds: tuned on the planted synthetic corpus —
    * full-batch GD on presence features oscillates at fewer rounds
    * (round-parity flips every prediction); at (2.0, 6) the margin
    * separates the planted classes perfectly at sf0.01 AND sf0.1. These
    * are POLICY constants: the declared rows must discriminate, and the
    * oracle replays whatever they are.
    */
  val Eta: Double = 2.0
  val Rounds: Int = 6

  final case class Model(w: Array[Double]) // length Buckets+1, last = bias

  /** Per-doc feature table: (idCol, y, fx) where fx = sorted
    * array<struct<b,c>> of PRESENCE features (c = 1 for every bucket the
    * doc touches — binarized bag-of-hashed-tokens, the short-text LR
    * standard: length-invariant, so a long doc's common tokens cannot
    * drown the class markers) + the bias entry (b=Buckets, c=1) — EVERY
    * doc gets the bias row, token-free docs included. The caller caches
    * this (it feeds every training round and the scorer).
    */
  def features(corpus: DataFrame, idCol: String, textCol: String,
      labelCol: Column): DataFrame = {
    // dedup INSIDE the aggregation buffer (collect_set, bounded at
    // ≤ Buckets entries per doc): a distinct() + groupBy would pay two
    // full exchanges of the exploded token stream for the same result
    val fx = corpus
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), pmod(hash60(col("tok")), lit(Buckets.toLong)).as("b"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("b"))).as("bs"))
      .select(col(idCol),
        transform(col("bs"), b => struct(b.as("b"), lit(1L).as("c"))).as("fx"))
    corpus.select(col(idCol), labelCol.cast("double").as("y"))
      .join(fx, Seq(idCol), "left")
      .select(col(idCol), col("y"),
        concat(
          coalesce(col("fx"), array().cast("array<struct<b:bigint,c:bigint>>")),
          array(struct(lit(Buckets.toLong).as("b"), lit(1L).as("c")))).as("fx"))
  }

  /** Margin fold over a feature array against a plan-literal weight
    * vector: s = Σ w[b]·c in array (= bucket) order + nothing else —
    * the one summation order every rendering shares.
    */
  private def marginCol(fx: Column, w: Array[Double]): Column = {
    val wLit = typedLit(w.toSeq)
    aggregate(fx, lit(0.0), (acc, f) =>
      acc + element_at(wLit, (f.getField("b") + lit(1L)).cast("int")) *
        f.getField("c").cast("double"))
  }

  /** `rounds` of full-batch GD from w = 0. Each round: one job computing
    * the quantized per-bucket gradient sums, one ≤ Buckets+1-row collect,
    * a driver-side weight fold. Round 1's sigmoid is exactly 0.5 for
    * every doc (psig(0) — spec-pinned), which the oracle exploits.
    */
  def train(feats: DataFrame, rounds: Int = Rounds, eta: Double = Eta): Model = {
    val n = feats.count()
    require(n > 0, "classifier needs a non-empty training corpus")
    var w = Array.fill(Buckets + 1)(0.0)
    for (_ <- 0 until rounds) {
      val rows = feats
        .select((PortableLog.psigCol(marginCol(col("fx"), w)) - col("y")).as("r"),
          explode(col("fx")).as("f"))
        .select(col("f.b").as("b"),
          floor(col("r") * col("f.c").cast("double") * lit(GradScale))
            .cast("long").as("q"))
        .groupBy("b").agg(sum(col("q")).as("g"))
        .collect()
      val grad = Array.fill(Buckets + 1)(0L)
      rows.foreach(r => grad(r.getLong(0).toInt) = r.getLong(1))
      w = Array.tabulate(Buckets + 1) { b =>
        val d = grad(b).toDouble / (GradScale * n.toDouble)
        w(b) - eta * d
      }
    }
    Model(w)
  }

  /** Persist trained weights through [[graft.pipeline.ModelStore]] —
    * (index, weight) rows; a parquet DOUBLE round-trips bit-exactly, so
    * the loaded model scores byte-identically (proved by the loaded-row
    * oracle). Returns the committed generation. */
  def save(spark: org.apache.spark.sql.SparkSession, m: Model,
      root: String): Long = {
    import spark.implicits._
    graft.pipeline.ModelStore.save(spark, root,
      Seq("weights" -> m.w.toSeq.zipWithIndex
        .map { case (w, i) => (i, w) }.toDF("i", "w").coalesce(1)))
  }

  def load(spark: org.apache.spark.sql.SparkSession, root: String): Model = {
    val rows = graft.pipeline.ModelStore.loadRelation(spark, root, "weights")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(rows.size == Buckets + 1,
      s"expected ${Buckets + 1} weights, loaded ${rows.size}")
    Model(Array.tabulate(Buckets + 1)(rows))
  }

  /** Score the cached feature table: (id, score_q, pred) with score_q =
    * floor(1e6·s) and pred = [s ≥ 0].
    */
  def score(feats: DataFrame, idCol: String, m: Model): DataFrame = {
    val s = marginCol(col("fx"), m.w)
    feats.select(col(idCol),
      floor(lit(ScoreScale) * s).cast("long").as("score_q"),
      (s >= lit(0.0)).cast("int").as("pred"))
  }

  /** Streaming-safe scorer: the per-doc presence buckets built as PURE
    * column work (sorted distinct hashed buckets — no feature
    * aggregation, no state), folded in the SAME order as the batch
    * scorer (sorted buckets, then bias; ×1.0 is an exact identity), so
    * its margin is BIT-IDENTICAL to [[score]]'s and the two rows share
    * one oracle rendering.
    */
  def scorePresenceFold(corpus: DataFrame, idCol: String, textCol: String,
      m: Model): DataFrame = {
    val s = presenceMarginCol(col(textCol), m)
    corpus.select(col(idCol),
      floor(lit(ScoreScale) * s).cast("long").as("score_q"),
      (s >= lit(0.0)).cast("int").as("pred"))
  }

  /** The streaming margin as a bare column — for pipelines that carry it
    * through further stages (e.g. the ingestion model gate computes it
    * per row BEFORE the bigram explode and lets the duplicate-insensitive
    * min() re-surface it after the LM aggregation).
    */
  def presenceMarginCol(text: Column, m: Model): Column = {
    val wLit = typedLit(m.w.toSeq)
    // NULL text reads as empty → bias-only margin, matching the batch
    // path (features() explodes NULL to zero rows and keeps the bias
    // entry); without the coalesce the fold is NULL and the documented
    // bit-identity with score() breaks on PERMISSIVE-parsed rows
    val bks = array_sort(array_distinct(
      transform(tokens(coalesce(text, lit(""))),
        t => pmod(hash60(t), lit(Buckets.toLong)))))
    aggregate(bks, lit(0.0), (acc, bb) =>
      acc + element_at(wLit, (bb + lit(1L)).cast("int"))) +
      lit(m.w(Buckets))
  }
}
