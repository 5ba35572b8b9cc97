package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.functions.PortableLog

/** UNIGRAM-LM tokenizer training (the SentencePiece family, Kudo 2018) —
  * the other production tokenizer next to BPE: a vocabulary of subword
  * PIECES with log-probabilities; a word tokenizes to its most probable
  * piece decomposition (Viterbi); training seeds a large candidate
  * vocabulary from substring counts and then runs EM-style PRUNE rounds —
  * segment the corpus under the current model, count piece usage on the
  * chosen paths (hard/Viterbi EM), keep the strongest pieces, re-estimate
  * probabilities. The WindFlow reference has no analog; the published
  * method is the spec, realized at the engine's determinism standard:
  *
  *  - all counting is per word TYPE weighted by the type's corpus count —
  *    the corpus is scanned ONCE (the type aggregation); every EM round
  *    touches only the vocabulary-sized type table;
  *  - probabilities quantize through the portable log
  *    (q = floor(10⁶·plog((c+1)/(N+B))), add-one smoothed over the kept
  *    vocabulary), so the model is a table of exact integers;
  *  - Viterbi minimizes the exact integer cost sum (−q); ties prefer the
  *    smallest split point — pinned, so a DuckDB oracle replays every
  *    segmentation decision bit-identically (the fixed-unroll DP CTEs);
  *  - segmentation runs as the native [[graft.functions.expressions
  *    .UnigramPieces]]/[[graft.functions.expressions.UnigramStats]]
  *    kernels with the model as ONE plan Literal — pure column work,
  *    zero shuffle, stream-safe (the apply half is the serving path).
  *
  * Scale: the type table is vocabulary-sized (word types, not tokens);
  * piece-count collects are policy-sized (≤ alphabet + keepMultis rows).
  * Seed substring explosion is bounded at W·L per type. At 100 TB the
  * corpus cost is exactly one tokenizing aggregation plus one kernel
  * pass per scoring run — the same shape as BPE apply.
  */
object Unigram {

  /** Max piece length — the DP's inner-loop bound and the oracle's
    * substring-join width. 4 covers the production sweet spot for
    * word-internal pieces. */
  val MaxPieceLen: Int = 4

  val Scale: Double = 1.0e6

  /** Seed vocabulary width (multi-char candidates) and per-round keep
    * width. Policy dimensions: the model is O(alphabet + keepMultis)
    * whatever the corpus size. */
  val SeedMultis: Int = 64
  val KeepMultis: Int = 32

  final case class Piece(piece: String, cnt: Long, q: Long)

  /** Trained tokenizer: kept pieces with their counts and quantized
    * log-probs, plus the OOV single-character fallback (the smoothing
    * floor — q of a zero-count piece), so any word segments. */
  final case class Model(pieces: Seq[Piece], oovQ: Long)

  /** (word, wcnt) word-TYPE table — the one corpus-sized aggregation. */
  def wordTypes(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))

  /** All substrings of length 1..[[MaxPieceLen]] with OCCURRENCE counts
    * weighted by type frequency — the seed statistics. Two bounded
    * explodes over the type table (≤ |word|·L rows per type), no HOF. */
  def seedCounts(types: DataFrame): DataFrame =
    types
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("wcnt"), col("s"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("s") + 1))).as("l"))
      .select(expr("substr(word, s, l)").as("piece"), col("wcnt"))
      .groupBy("piece").agg(sum("wcnt").as("cnt"))

  private def rescored(kept: Seq[(String, Long)]): Model = {
    val n = kept.map(_._2).sum
    val b = kept.size.toLong
    def q(c: Long): Long =
      math.floor(Scale * PortableLog.plog(
        (c + 1L).toDouble / (n + b).toDouble)).toLong
    Model(
      kept.sortBy(_._1).map { case (p, c) => Piece(p, c, q(c)) },
      q(0L))
  }

  /** Codepoint length — "single character" everywhere in this trainer
    * means ONE CODEPOINT (Spark `length`, DuckDB `length`, and the
    * kernel's DP all count codepoints): a UTF-16 `.length` would class a
    * 1-codepoint emoji as multi-char and break the all-singles coverage
    * guarantee on supplementary-plane text (r12 advice). */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Vocabulary selection shared by the seed and every prune round: ALL
    * single characters (coverage — every word must segment) plus the top
    * `keep` multi-char pieces by (count DESC, piece ASC). */
  private def selectVocab(counts: Seq[(String, Long)], keep: Int): Seq[(String, Long)] = {
    val (singles, multis) = counts.partition(p => cpLen(p._1) == 1)
    singles ++ multis.filter(_._2 > 0L)
      .sortBy { case (p, c) => (-c, p) }.take(keep)
  }

  /** The model as a plan Literal for the segmentation kernels. */
  private def modelLit(m: Model): Column =
    typedLit(m.pieces.map(p => (p.piece, p.q)))

  /** Train: seed from substring counts, then `rounds` Viterbi-EM prune
    * rounds (segment types → usage counts → keep → re-estimate). */
  def train(corpus: DataFrame, textCol: String, rounds: Int = 1,
      seedMultis: Int = SeedMultis, keepMultis: Int = KeepMultis): Model = {
    require(rounds >= 0, s"rounds must be non-negative: $rounds")
    val types = graft.Caches.track(wordTypes(corpus, textCol))
    val seed = graft.Caches.track(seedCounts(types))
    // policy-sized collects: the full alphabet + the top-K multis
    val singles = seed.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val multis = seed.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedMultis)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var m = rescored(selectVocab(singles ++ multis, seedMultis))
    var r = 0
    while (r < rounds) {
      // E-step: Viterbi paths per TYPE, usage weighted by type count —
      // output bounded by the vocabulary, collect ≤ B rows
      val usage = types
        .select(col("wcnt"),
          explode(graft.functions.expressions.UnigramKernels
            .piecesOf(col("word"), modelLit(m), m.oovQ)).as("piece"))
        .groupBy("piece").agg(sum("wcnt").as("cnt"))
        .collect().map(x => (x.getString(0), x.getLong(1))).toMap
      // M-step: singles persist (zero-usage smoothed), used multis
      // compete for the keep slots; re-estimate over the kept set
      val counts =
        m.pieces.filter(p => cpLen(p.piece) == 1)
          .map(p => (p.piece, usage.getOrElse(p.piece, 0L))) ++
        usage.filter(u => cpLen(u._1) > 1).toSeq
      m = rescored(selectVocab(counts, keepMultis))
      r += 1
    }
    m
  }

  /** Per-document segmentation stats with the frozen model — ONE kernel
    * pass: (id, n_tokens, n_pieces, unigram_logp_q). Pure column work,
    * stream-safe; NULL text reads as empty. */
  def score(corpus: DataFrame, idCol: String, textCol: String, m: Model): DataFrame =
    corpus.select(col(idCol),
        graft.functions.expressions.UnigramKernels
          .statsOf(coalesce(col(textCol), lit("")), modelLit(m), m.oovQ).as("__u"))
      .select(col(idCol),
        col("__u.n_tokens").as("n_tokens"),
        col("__u.n_pieces").as("n_pieces"),
        col("__u.logp_q").as("unigram_logp_q"))

  /** The trained vocabulary as a DataFrame (piece, cnt, q) — the train
    * row's output and the persistence relation. */
  def vocabFrame(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.pieces.map(p => (p.piece, p.cnt, p.q)).toDF("piece", "cnt", "q")
      .coalesce(1)
  }

  /** Persist through [[graft.pipeline.ModelStore]] — pieces are exact
    * integers, so the round trip is value-exact. */
  def save(spark: org.apache.spark.sql.SparkSession, m: Model, root: String): Long =
    graft.pipeline.ModelStore.save(spark, root,
      Seq("pieces" -> vocabFrame(spark, m)),
      Map("oov_q" -> m.oovQ.toString))

  def load(spark: org.apache.spark.sql.SparkSession, root: String): Model = {
    import graft.pipeline.ModelStore
    val oov = ModelStore.loadParams(spark, root)("oov_q").toLong
    Model(
      ModelStore.loadRelation(spark, root, "pieces").orderBy("piece")
        .collect().map(r => Piece(r.getString(0), r.getLong(1), r.getLong(2))).toSeq,
      oov)
  }
}
