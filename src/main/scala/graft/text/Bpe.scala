package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{tokens, wordGrams}

/** Distributed BPE-merge TRAINING (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units"): R rounds of
  * "count adjacent symbol pairs corpus-wide → merge the most frequent
  * pair everywhere", the iterative-refinement pattern the engine already
  * uses for quantized Lloyd iterations — each round is ONE
  * map-side-combined pair-count aggregation over the corpus plus a
  * broadcast-literal per-row rewrite; the driver holds R best-pair rows
  * (one per round), never data.
  *
  * Symbols start from the whitespace tokens (word-level merges — the
  * machinery is start-granularity-agnostic: pre-splitting words into
  * characters trains classic char-BPE through the identical rounds).
  * A merged symbol is `a JOINER b` with a control-char joiner (U+0001)
  * that whitespace tokenization can never produce; natural tokens
  * containing U+0001 would alias merged symbols and are the caller's
  * contract to exclude (normalization strips control chars upstream).
  *
  * The per-round rewrite must merge NON-OVERLAPPING occurrences
  * left-to-right (the BPE rule: [a,a,a] under (a,a) → [aa, a]). Plain
  * substring replace over the space-joined state can't see token
  * boundaries, and adjacent matches share their separator space — so the
  * state doubles its spaces first (`a b` → `a  b`), each match then
  * consumes one outer space on each side leaving the neighbor's intact,
  * and a final whitespace collapse renormalizes. `replace` scans
  * left-to-right non-overlapping with identical semantics in Spark and
  * DuckDB, which is what lets the oracle replay training byte-exactly.
  *
  * Ties on the pair count break by pair string ascending — a total,
  * engine-portable order (symbols are lowercase text + U+0001), so
  * training is deterministic.
  *
  * Scale shape: the state (one normalized string per doc) is cached per
  * round (a checkpoint at 100 TB); pair counting is partial→final
  * HashAggregate moving one (pair, count) row per distinct pair per map
  * partition; the rewrite is pure per-row column work. R rounds = R
  * corpus scans by construction — the algorithm is inherently iterative.
  */
object Bpe {

  val Joiner = "\u0001"

  final case class Merge(a: String, b: String, count: Long)

  /** Space-joined, whitespace-normalized initial symbol state. */
  def initState(text: Column): Column = array_join(tokens(text), " ")

  /** One greedy left-to-right merge of (a, b) → a+joiner+b over a
    * space-joined symbol state (see the class doc for the
    * space-doubling trick). */
  def mergeStep(s: Column, a: String, b: String, joiner: String = Joiner): Column =
    trim(regexp_replace(
      replace(
        concat(lit(" "), replace(s, lit(" "), lit("  ")), lit(" ")),
        lit(s" $a  $b "), lit(s" $a$joiner$b ")),
      " +", " "))

  /** Apply an already-trained merge list to raw text, in training order —
    * the inference half of the tokenizer: a frozen merge table is a
    * handful of driver constants, so application is a chain of R
    * broadcast-literal rewrites — pure per-row column work, no shuffle,
    * no state, stream-safe (the production shape: BPE is trained offline
    * on the existing corpus and applied at ingestion; training on the
    * stream would make the vocabulary drift with arrival order). */
  def applyMerges(text: Column, merges: Seq[Merge], joiner: String = Joiner): Column =
    merges.foldLeft(initState(text))((s, m) => mergeStep(s, m.a, m.b, joiner))

  /** Persist a trained merge table through
    * [[graft.pipeline.ModelStore]] — ORDER is the model ([[applyMerges]]
    * replays merges in training order), so each row carries its ordinal
    * and [[loadMerges]] restores by it. Returns the committed
    * generation. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], root: String): Long = {
    import spark.implicits._
    graft.pipeline.ModelStore.save(spark, root,
      Seq("merges" -> merges.zipWithIndex
        .map { case (m, i) => (i, m.a, m.b, m.count) }
        .toDF("ord", "a", "b", "cnt").coalesce(1)))
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      root: String): Seq[Merge] =
    graft.pipeline.ModelStore.loadRelation(spark, root, "merges")
      .orderBy("ord").collect()
      .map(r => Merge(r.getString(1), r.getString(2), r.getLong(3))).toSeq

  /** Train `rounds` merges over the corpus; returns the learned merge
    * table (may be shorter than `rounds` if the corpus runs out of
    * adjacent pairs) and the final per-doc state (idCol, "s"). Each
    * round's state is registered with [[graft.Caches]]; callers release
    * after materializing their result.
    */
  def train(df: DataFrame, idCol: String, textCol: String, rounds: Int,
      joiner: String = Joiner): (Seq[Merge], DataFrame) = {
    var cur = graft.Caches.track(
      df.select(col(idCol), initState(col(textCol)).as("s")))
    val merges = Seq.newBuilder[Merge]
    var exhausted = false
    var r = 0
    while (r < rounds && !exhausted) {
      // the state is normalized single-space lowercase, so tokens(s) is
      // exactly split-by-space; wordGrams(n=2) = adjacent pairs with
      // multiplicity (empty for sub-2-symbol docs)
      val best = cur.select(explode(wordGrams(col("s"), 2)).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(a, b) = best(0).getString(0).split(" ", 2)
        merges += Merge(a, b, best(0).getLong(1))
        cur = graft.Caches.track(
          cur.select(col(idCol), mergeStep(col("s"), a, b, joiner).as("s")))
      }
      r += 1
    }
    (merges.result(), cur)
  }
}
