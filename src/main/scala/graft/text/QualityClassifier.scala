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
    * the one summation order every rendering shares. Native codegen'd
    * kernel ([[graft.functions.expressions.LrMarginFold]]) — executed
    * R+1 times over the corpus per training row, this fold was the last
    * hot HOF-lambda (CodegenFallback) site in the engine; the kernel is
    * bit-identical (spec-pinned against [[marginColComposable]]).
    */
  private def marginCol(fx: Column, w: Array[Double]): Column =
    graft.functions.expressions.LrMarginFold.of(fx, typedLit(w.toSeq))

  /** The raw (unquantized) margin of a feature array under a trained
    * model — public for calibration reporting ([[reliabilityBins]] /
    * [[brierEce]] feed it to the portable sigmoid; [[score]]'s score_q
    * already floors it to the 10⁶ grid). */
  def margin(fx: Column, m: Model): Column = marginCol(fx, m.w)

  /** The retired composable rendering of [[marginCol]] — kept as the
    * readable specification and the spec's bit-identity anchor. */
  private[graft] def marginColComposable(fx: Column, w: Array[Double]): Column = {
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

  /** Exact ROC-AUC of an integer score column against binary labels —
    * the model-quality number every classifier gate decision reads,
    * computed as the Mann–Whitney U statistic with MIDRANK tie handling
    * in EXACT integer arithmetic: group by score (one map-side-combined
    * Exchange, distinct-score-sized output), cumulative counts via the
    * distributed two-pass prefix scan (no single-task window), midrank
    * of a tie group doubled to stay integral (2·mid = 2·cum_before +
    * cnt + 1), R2 = Σ_groups pos·(2·mid) as DECIMAL(38,0) (Σranks
    * reaches N·n_pos — past int64 at corpus scale; DuckDB mirrors with
    * HUGEINT), and AUC = (R2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg) as
    * ONE exact-input IEEE division. Built-in percentile/rank paths are
    * either a global sort or a merge-order-dependent sketch; this is
    * exact, order-free and oracle-replayable. Degenerate inputs (a
    * single class) emit AUC 0.0 by a guarded CASE. Output one row:
    * (n_pos, n_neg, auc).
    */
  def aucReport(scored: DataFrame, scoreCol: String,
      labelCol: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val gs = scored.select(col(scoreCol).cast("long").as("q"),
        labelCol.cast("long").as("y"))
      .groupBy("q")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
    val cum = graft.operators.PrefixSum.runningSum(gs, "cnt", Seq("q"))
      .withColumn("before", col("running_cnt") - col("cnt"))
    cum.agg(
        sum(col("pos").cast(dec) *
          (lit(2L) * col("before") + col("cnt") + lit(1L)).cast(dec)).as("r2"),
        sum(col("pos").cast(dec)).as("np"),
        sum((col("cnt") - col("pos")).cast(dec)).as("nn"))
      .select(col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        when(col("np") === 0 || col("nn") === 0, lit(0.0))
          .otherwise((col("r2") - col("np") * (col("np") + lit(1L).cast(dec)))
            .cast("double") /
            (lit(2L).cast(dec) * col("np") * col("nn")).cast("double"))
          .as("auc"))
  }

  /** Per-key [[aucReport]] — "which source's documents does the model
    * rank well": the tie-group table keys on (key, score), the
    * cumulative pass is a window PARTITIONED by key (parallel across
    * keys — no single-partition stage, the grouped-quantile scale
    * argument), the rest is the identical exact dag per key. */
  def aucReportBy(scored: DataFrame, keyCol: String, scoreCol: String,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val gs = scored.select(col(keyCol), col(scoreCol).cast("long").as("q"),
        labelCol.cast("long").as("y"))
      .groupBy(keyCol, "q")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
    val w = Window.partitionBy(keyCol).orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = gs.withColumn("before", sum("cnt").over(w) - col("cnt"))
    cum.groupBy(keyCol)
      .agg(
        sum(col("pos").cast(dec) *
          (lit(2L) * col("before") + col("cnt") + lit(1L)).cast(dec)).as("r2"),
        sum(col("pos").cast(dec)).as("np"),
        sum((col("cnt") - col("pos")).cast(dec)).as("nn"))
      .select(col(keyCol),
        col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        when(col("np") === 0 || col("nn") === 0, lit(0.0))
          .otherwise((col("r2") - col("np") * (col("np") + lit(1L).cast(dec)))
            .cast("double") /
            (lit(2L).cast(dec) * col("np") * col("nn")).cast("double"))
          .as("auc"))
  }

  /** Exact precision/recall sweep over every distinct score threshold —
    * the curve a gate-threshold decision actually reads (AUC says "does
    * the model rank at all"; this says "at τ, what fraction of kept docs
    * is truly positive and what fraction of positives survives").
    * Predict positive when score ≥ q for each distinct score q:
    * tp(q) = P − pos_before(q) and n_pred(q) = N − cnt_before(q) come
    * from ONE multi-column two-pass prefix scan over the distinct-score
    * tie groups ([[graft.operators.PrefixSum.runningSums]] — no global
    * sort, no per-column rescan), the two totals land as
    * driver-collected plan literals (the registry-wide sweep forbids
    * even a 1-row broadcast-NL totals join, and two scalars don't need
    * one), and precision/recall are single IEEE divisions of exact
    * integers. O(distinct scores) output.
    */
  def prCurve(scored: DataFrame, scoreCol: String,
      labelCol: Column): DataFrame = {
    val gs = scored.select(col(scoreCol).cast("long").as("q"),
        labelCol.cast("long").as("y"))
      .groupBy("q")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
    val cum = graft.operators.PrefixSum.runningSums(
      gs, Seq("cnt", "pos"), Seq("q"))
    // totals land as TWO plan literals (a 2-long driver collect — the
    // registry-wide sweep forbids even a 1-row broadcast-NL totals join,
    // and two scalars don't need one); cum's scan is cached inside the
    // prefix pass, so this costs one bounded agg job, not a rescan
    val tot = cum.agg(sum("cnt").cast("long"), sum("pos").cast("long")).first()
    val (n, p) = (tot.getLong(0), tot.getLong(1))
    cum
      .select(col("q").as("score_q"),
        (lit(n) - (col("running_cnt") - col("cnt"))).as("n_pred"),
        (lit(p) - (col("running_pos") - col("pos"))).as("tp"))
      .select(col("score_q"), col("n_pred"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        // the threshold's own tie group is in the kept set, so n_pred ≥ 1
        (col("tp").cast("double") / col("n_pred").cast("double"))
          .as("precision"),
        (if (p == 0) lit(0.0)
         else col("tp").cast("double") / lit(p.toDouble)).as("recall"))
  }

  /** Probability grid for calibration: p quantizes to floor(p·10⁹). */
  val ProbScale: Long = 1000000000L

  /** Reliability bins for calibration-error reporting. */
  val ReliabilityBins: Int = 10

  /** Per-doc (pq, y): the portable sigmoid of the margin on the exact
    * 10⁹ grid plus the binary label — the shared front of
    * [[reliabilityBins]] and [[brierEce]]. */
  private def probQuantized(scored: DataFrame, marginCol: Column,
      labelCol: Column): DataFrame =
    scored.select(
      floor(PortableLog.psigCol(marginCol) * lit(ProbScale.toDouble))
        .cast("long").as("pq"),
      labelCol.cast("long").as("y"))

  /** The reliability diagram (Guo et al., "On Calibration of Modern
    * Neural Networks" — the ECE's per-bin view) in exact arithmetic:
    * p = psig(margin) on the 10⁹ integer grid, `bins` equal-width
    * probability bins (psig can round to exactly 1.0 for large margins,
    * so the top edge clamps into the last bin), and per bin the doc
    * count, label positives, mean confidence, empirical accuracy and
    * |acc − conf| — each a single IEEE division of exact integer sums
    * (confidence sums are DECIMAL(38,0): 10¹² docs × 10⁹ passes int64).
    * One aggregation; O(bins) output.
    */
  def reliabilityBins(scored: DataFrame, marginCol: Column,
      labelCol: Column, bins: Int = ReliabilityBins): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val w = ProbScale / bins
    probQuantized(scored, marginCol, labelCol)
      .select(least(expr(s"pq div $w"), lit(bins - 1L)).as("bin"),
        col("pq"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("y").as("n_pos"),
        sum(col("pq").cast(dec)).as("spq"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        (col("spq").cast("double") /
          (col("n_docs").cast("double") * lit(ProbScale.toDouble)))
          .as("conf"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("acc"),
        (abs(col("n_pos").cast(dec) * lit(ProbScale) - col("spq"))
          .cast("double") /
          (col("n_docs").cast("double") * lit(ProbScale.toDouble)))
          .as("gap"))
  }

  /** Brier score + expected calibration error as ONE row (n_docs, ece,
    * brier) — the two scalar calibration numbers a model gate publishes.
    * Both numerators are exact integer sums (the weighted per-bin ECE
    * term n_b·|acc_b − conf_b| telescopes to |n_pos_b·10⁹ − Σpq_b|/10⁹,
    * so no double ever sums; Brier's Σ(pq − y·10⁹)² is ≤ 10¹⁸ per doc,
    * summed as DECIMAL(38,0)), each finished by a single division.
    */
  def brierEce(scored: DataFrame, marginCol: Column, labelCol: Column,
      bins: Int = ReliabilityBins): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val w = ProbScale / bins
    val perBin = probQuantized(scored, marginCol, labelCol)
      .select(least(expr(s"pq div $w"), lit(bins - 1L)).as("bin"),
        col("pq"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("np"),
        sum(col("pq").cast(dec)).as("spq"),
        sum(((col("pq") - col("y") * lit(ProbScale)) *
          (col("pq") - col("y") * lit(ProbScale))).cast(dec)).as("ssq"))
    perBin.agg(
        sum("n").cast("long").as("n_docs"),
        sum(abs(col("np").cast(dec) * lit(ProbScale) - col("spq"))).as("eq"),
        sum(col("ssq")).as("sq"))
      .select(col("n_docs"),
        (col("eq").cast("double") /
          (col("n_docs").cast("double") * lit(ProbScale.toDouble)))
          .as("ece"),
        (col("sq").cast("double") /
          (col("n_docs").cast("double") *
            lit(ProbScale.toDouble) * lit(ProbScale.toDouble)))
          .as("brier"))
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
    // the margin fold evaluates ONCE behind a pushdown fence (guide §4.4):
    // downstream `.filter(pred === 1)` gates would otherwise be rewritten
    // with the fold substituted in and pushed below this projection —
    // every consumer paid the fold twice per row. CollapseProject cannot
    // inline a non-deterministic column used twice, so the two-projection
    // shape is stable.
    val m0 = graft.functions.expressions.Fence(marginCol(col("fx"), m.w))
    feats.select(col(idCol), m0.as("__margin"))
      .select(col(idCol),
        floor(lit(ScoreScale) * col("__margin")).cast("long").as("score_q"),
        (col("__margin") >= lit(0.0)).cast("int").as("pred"))
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
    // same §4.4 fence as [[score]] — here the duplicated work would be the
    // whole per-row tokenize+bucket+fold text kernel, per micro-batch on
    // the streaming consumers
    val m0 = graft.functions.expressions.Fence(presenceMarginCol(col(textCol), m))
    corpus.select(col(idCol), m0.as("__margin"))
      .select(col(idCol),
        floor(lit(ScoreScale) * col("__margin")).cast("long").as("score_q"),
        (col("__margin") >= lit(0.0)).cast("int").as("pred"))
  }

  /** The streaming margin as a bare column — for pipelines that carry it
    * through further stages (e.g. the ingestion model gate computes it
    * per row BEFORE the bigram explode and lets the duplicate-insensitive
    * min() re-surface it after the LM aggregation).
    */
  def presenceMarginCol(text: Column, m: Model): Column =
    // NULL text reads as empty → bias-only margin, matching the batch
    // path (features() explodes NULL to zero rows and keeps the bias
    // entry); without the coalesce the kernel returns NULL and the
    // documented bit-identity with score() breaks on PERMISSIVE rows.
    // Native codegen'd kernel (LrPresenceMargin): one tokenization,
    // presence bitmap, ascending-bucket fold, bias added last — spec-
    // pinned bit-identical to [[presenceMarginColComposable]].
    graft.functions.expressions.LrPresenceMargin.of(
      coalesce(text, lit("")), typedLit(m.w.toSeq))

  /** The retired composable rendering of [[presenceMarginCol]] — kept as
    * the readable specification and the spec's bit-identity anchor. */
  private[graft] def presenceMarginColComposable(text: Column, m: Model): Column = {
    val wLit = typedLit(m.w.toSeq)
    val bks = array_sort(array_distinct(
      transform(tokens(coalesce(text, lit(""))),
        t => pmod(hash60(t), lit(Buckets.toLong)))))
    aggregate(bks, lit(0.0), (acc, bb) =>
      acc + element_at(wLit, (bb + lit(1L)).cast("int"))) +
      lit(m.w(Buckets))
  }
}
