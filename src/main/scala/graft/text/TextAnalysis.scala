package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond the reference's surface — SURVEY §2.7 north-star extras).
  *
  * All ops are single-pass column expressions over the document scan: no
  * shuffle, no UDF — they stay inside whole-stage codegen and scale
  * linearly with corpus bytes. Every op has an exact DuckDB rendering in
  * [[graft.queries.PipelineQueries]]; double-valued scores use identical
  * expression trees on both engines (no transcendentals, no
  * order-dependent SUMs), so values are bit-equal.
  */
object TextAnalysis {

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic tie-break: first list wins.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "es" -> Seq("el", "los", "y", "es", "una", "se", "por", "con", "para", "como"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Count (with multiplicity) of tokens present in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t)))

  /** Language prediction by stopword-hit argmax; 'und' when no list hits.
    * Tie-break follows [[Stopwords]] order.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val hits = Stopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }
    val counts = hits.map(_._2)
    def winner(i: Int): Column = {
      val mine = counts(i)
      val beatsAll = counts.zipWithIndex.collect {
        case (c, j) if j < i => mine > c   // earlier langs win ties
        case (c, j) if j > i => mine >= c
      }.reduce(_ && _)
      beatsAll && mine > 0
    }
    hits.indices.foldRight(lit("und")) { (i, els) =>
      when(winner(i), lit(Stopwords(i)._1)).otherwise(els)
    }
  }

  /** Maximum admitted document length in CHARACTERS — the explicit
    * max-doc-length policy knob for cleaning pipelines. A document is one
    * row on one core: partitioning cannot split it, so a single multi-GB
    * doc serializes one task (and one state-store write in the streaming
    * path) no matter how many executors the job has — the only scale
    * defense is refusing it at admission. The Gopher rule already implies
    * a bound (≤ 100k tokens × mean token length ≤ 10 ≈ 1.1 MB of text),
    * so Gopher-gated pipelines (v2) are safe by construction;
    * quality-score-only pipelines (v1) have NO implicit bound and must
    * compose [[lengthGateColumns]] at 100 TB. Default 1 MiB ≈ the Gopher
    * implied ceiling. Env-gated evidence: `ScaleStressSpec`'s
    * long-document case runs the kernels on a ~100 MB doc and asserts
    * both gates refuse it while the quality score alone would not.
    */
  val MaxDocChars: Long = 1L << 20

  /** The admission gate for [[MaxDocChars]]: (n_chars, len_pass 0/1). */
  def lengthGateColumns(text: Column,
      maxChars: Long = MaxDocChars): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text).cast("long"),
    "len_pass" -> (length(text).cast("long") <= maxChars).cast("int"))

  /** Quality features + composite score in [0,1]. Pure rational arithmetic
    * (cross-engine exact); components are standard pretraining-filter
    * signals: length, punctuation/digit density, stopword density.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val punctLen = nChars - length(regexp_replace(text, "[.,!?;:]", "")).cast("long")
    val digitLen = nChars - length(regexp_replace(text, "[0-9]", "")).cast("long")
    val dTok = nTok.cast("double")
    val meanTokLen = when(nTok > 0,
      length(concat_ws("", toks)).cast("double") / dTok).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, punctLen.cast("double") / nChars.cast("double")).otherwise(lit(0.0))
    val digitRatio = when(nChars > 0, digitLen.cast("double") / nChars.cast("double")).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      stopwordHits(toks, Stopwords.head._2).cast("double") / dTok).otherwise(lit(0.0))
    val score =
      least(nTok, lit(100L)).cast("double") / lit(100.0) * lit(0.4) +
        (lit(1.0) - punctRatio) * lit(0.2) +
        (lit(1.0) - digitRatio) * lit(0.1) +
        least(stopRatio * lit(5.0), lit(1.0)) * lit(0.3)
    Seq(
      "n_tokens" -> nTok,
      "mean_token_len" -> meanTokLen,
      "punct_ratio" -> punctRatio,
      "digit_ratio" -> digitRatio,
      "stopword_ratio" -> stopRatio,
      "quality_score" -> score)
  }

  /** Document fingerprint: minimum 60-bit hash over the char n-gram set of
    * the lowercased text (a one-permutation minhash — robust to local
    * edits), plus the distinct-gram cardinality. Computed by the native
    * single-pass [[graft.functions.expressions.GramFingerprint]] kernel: no
    * explode, no shuffle, and the lowercasing runs once per row (the
    * composable HOF rendering re-evaluates `lower(text)` per gram — no CSE
    * inside lambdas — making it O(len²) per document; measured 10× slower).
    */
  def fingerprint(text: Column, n: Int = 8): (Column, Column) = {
    val st = graft.functions.expressions.GramFingerprint.of(lower(text), n)
    (st.getField("fp"), st.getField("n_grams"))
  }

  /** Repetition-based quality signals — the Gopher/C4-style filters a
    * pretraining pipeline runs after the basic ratios in
    * [[qualityColumns]]: machine-generated and boilerplate text shows up
    * as duplicated word n-grams and a single dominating token.
    *
    *  - `dup_gram{2,3}_ratio`: fraction of word n-grams (with
    *    multiplicity) that are duplicates of an earlier one —
    *    1 − distinct/total.
    *  - `top_token_ratio`: occurrences of the most frequent token /
    *    total tokens.
    *
    * The integer counts come from the native single-pass
    * [[graft.functions.expressions.RepetitionStats]] kernel (one
    * tokenization per row, codegen'd) — the composable HOF rendering
    * (`wordGrams` + `array_distinct` per width + an `aggregate` fold for
    * the mode) re-tokenizes per derived column and every HOF is
    * CodegenFallback; measured ~7 s vs sub-second on the sf0.1 documents
    * scan. No shuffle; ratios are one integer-derived division per value,
    * so the DuckDB oracle is bit-exact whatever plan it uses for the
    * integer counts.
    */
  def repetitionColumns(text: Column): Seq[(String, Column)] = {
    val st = graft.functions.expressions.RepetitionStats.of(text)
    def ratio(dup: Column, total: Column): Column =
      when(total > 0, dup.cast("double") / total.cast("double")).otherwise(lit(0.0))
    Seq(
      "n_tokens" -> st.getField("n_tokens"),
      "dup_gram2_ratio" -> ratio(
        st.getField("g2_total") - st.getField("g2_distinct"), st.getField("g2_total")),
      "dup_gram3_ratio" -> ratio(
        st.getField("g3_total") - st.getField("g3_distinct"), st.getField("g3_total")),
      "top_token_ratio" -> ratio(st.getField("top_token"), st.getField("n_tokens")),
      // Gopher's line-level signals: fraction of lines that duplicate an
      // earlier one, and fraction of line characters inside the
      // beyond-first occurrences (both over raw, case-sensitive lines)
      "dup_line_ratio" -> ratio(
        st.getField("n_lines") - st.getField("line_distinct"), st.getField("n_lines")),
      "dup_line_char_ratio" -> ratio(
        st.getField("dup_line_chars"), st.getField("line_chars")))
  }

  /** The REST of the Gopher rule set — the structural signals beyond the
    * ratio features of [[qualityColumns]] and the repetition signals of
    * [[repetitionColumns]], completing the published filter:
    *
    *  - `hash_word_ratio` / `ellipsis_word_ratio`: '#' occurrences /
    *    tokens and ("..." + "…") occurrences / tokens — PER SYMBOL, as
    *    the paper states the rule ("symbol-to-word ratio greater than
    *    0.1 for either the hash symbol or the ellipsis"; a combined
    *    hash+ellipsis sum would be strictly tighter than published);
    *  - `bullet_line_ratio` / `ellipsis_line_ratio`: fraction of raw lines
    *    starting with a bullet ("•", "- ", "* ") / ending in an ellipsis;
    *  - `alpha_word_ratio`: fraction of tokens containing ≥1 letter;
    *  - `gopher_stop_hits`: how many of the paper's 8 required stopwords
    *    (the, be, to, of, and, that, have, with) appear at least once;
    *  - `gopher_pass`: the composite accept rule with the paper's
    *    thresholds (50 ≤ tokens ≤ 100k, mean token length in [3, 10],
    *    hash ratio ≤ 0.1 AND ellipsis ratio ≤ 0.1, bullets ≤ 0.9,
    *    ellipses ≤ 0.3, alpha ≥ 0.8, stop hits ≥ 2) as 0/1.
    *
    * Same execution shape as the other text ops: pure per-row column
    * work, no shuffle; every ratio is a division of exact integer counts
    * so the DuckDB oracle is bit-equal. The integer counters come from
    * the native single-pass
    * [[graft.functions.expressions.GopherStats]] kernel (one
    * tokenization + one line split per row, codegen'd) — the composable
    * HOF rendering re-evaluated the tokenization/line split per derived
    * column with every HOF a CodegenFallback, the exact cost profile the
    * RepetitionStats kernel already retired for the repetition signals.
    */
  def gopherColumns(text: Column): Seq[(String, Column)] = {
    val st = graft.functions.expressions.GopherStats.of(text)
    val nTok = st.getField("n_tokens")
    val nLines = st.getField("n_lines")
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    val hashRatio = ratio(st.getField("n_hash"), nTok)
    val ellRatio = ratio(st.getField("n_ellipsis"), nTok)
    val stopHits = st.getField("stop_hits")
    val meanTokLen = ratio(st.getField("tok_chars"), nTok)
    val pass = (nTok >= 50L && nTok <= 100000L &&
      meanTokLen >= 3.0 && meanTokLen <= 10.0 &&
      hashRatio <= 0.1 && ellRatio <= 0.1 &&
      ratio(st.getField("n_bullet"), nLines) <= 0.9 &&
      ratio(st.getField("n_ellline"), nLines) <= 0.3 &&
      ratio(st.getField("n_alpha"), nTok) >= 0.8 &&
      stopHits >= 2L).cast("int")
    Seq(
      "hash_word_ratio" -> hashRatio,
      "ellipsis_word_ratio" -> ellRatio,
      "bullet_line_ratio" -> ratio(st.getField("n_bullet"), nLines),
      "ellipsis_line_ratio" -> ratio(st.getField("n_ellline"), nLines),
      "alpha_word_ratio" -> ratio(st.getField("n_alpha"), nTok),
      "gopher_stop_hits" -> stopHits,
      "gopher_pass" -> pass)
  }

  /** Boilerplate line set for [[lineCleanColumns]] — matched against the
    * trimmed, lowercased line. A deployment swaps in its own list (policy
    * knob, not an engine property); entries must be lowercase and
    * space-trimmed.
    */
  val BoilerplateLines: Seq[String] = Seq(
    "home | about | contact", "click here", "sign in", "accept cookies",
    "share this article", "advertisement")

  /** RefinedWeb-style LINE-WISE correction — the in-document counterpart
    * of corpus-wide line dedup ([[graft.dedup.Dedup.dedupLinesKeepFirst]]):
    * drop navigation/boilerplate lines (trimmed-lowercased membership in
    * `boilerplate`) and sub-`minLineChars` fragments, reassemble the
    * document from the surviving lines, and report how much survived so a
    * pipeline can drop documents that were mostly chrome.
    *
    * Columns: n_lines, n_lines_kept, clean_text, line_keep_ratio
    * (clean/original character ratio — a single division of exact integer
    * lengths, bit-equal cross-engine). Pure per-row column work: no
    * shuffle, scales linearly with corpus bytes like the other text ops.
    * The trim is the engines' shared space-only trim (both Spark and
    * DuckDB default-trim ' ' exactly).
    */
  def lineCleanColumns(text: Column,
      boilerplate: Seq[String] = BoilerplateLines,
      minLineChars: Int = 10): Seq[(String, Column)] = {
    val ls = split(text, "\n")
    val bp = typedLit(boilerplate) // ONE array literal, not N AST nodes (r16 typedLit doctrine)
    val kept = filter(ls, l =>
      !array_contains(bp, trim(lower(l))) && length(trim(l)) >= minLineChars)
    val cleanText = array_join(kept, "\n")
    Seq(
      "n_lines" -> size(ls),
      "n_lines_kept" -> size(kept),
      "clean_text" -> cleanText,
      "line_keep_ratio" -> when(length(text) > 0,
        length(cleanText).cast("double") / length(text).cast("double"))
        .otherwise(lit(0.0)))
  }

  /** GPT-2-style pretokenizer pattern, restricted to constructs RE2 also
    * supports (no lookahead) so the DuckDB oracle runs the byte-identical
    * regex: contractions, space-prefixed letter/digit/punctuation runs,
    * whitespace runs. Greedy left-to-right alternation gives the same
    * match sequence in Java regex and RE2. Whitespace is the shared
    * explicit class, not `\s` (Java/RE2 diverge on `\x0B` — r6 advice).
    */
  val BpePattern: String = {
    val ws = graft.functions.GraftFunctions.WsClass // "[ \t\n\x0B\f\r]"
    val wsChars = ws.stripPrefix("[").stripSuffix("]")
    s"'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^$wsChars\\p{L}\\p{N}]+|$ws+"
  }

  /** BPE-ish token count: number of pretokenizer segments — the standard
    * cheap proxy for LLM token cost (actual BPE merges only split segments
    * further by a roughly constant per-language factor).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** PII patterns for redaction, restricted (like [[BpePattern]]) to the
    * Java-regex ∩ RE2 subset — no lookaround, no word boundaries — so the
    * DuckDB oracle runs the byte-identical expressions. Deliberately
    * conservative shapes (a training-corpus scrubber prefers precision;
    * recall tuning is a policy knob, not an engine property).
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\(?[0-9]{3}\\)?[ -][0-9]{3}-[0-9]{4}"
  val Ipv4Pattern: String = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** URL pattern in the Java-regex ∩ RE2 subset (like [[BpePattern]] /
    * the PII patterns): scheme + host + optional path of unreserved/
    * common URL characters. `(?i)` because schemes and hostnames are
    * case-insensitive by definition (HTTPS://Tracker.NET is the same
    * resource); the host must END in an alphanumeric so a
    * sentence-terminating '.' after a path-less URL is not swallowed
    * into the host ("see https://x.net. Next" → host x.net, not
    * "x.net."). Conservative on purpose — corpus hygiene wants
    * precision, and the DuckDB oracle must run the byte-identical
    * expression.
    */
  val UrlPattern: String =
    "(?i)https?://[A-Za-z0-9.-]*[A-Za-z0-9](/[A-Za-z0-9._~/%+&=?#-]*)?"

  /** Lowercased host of one extracted url: strip the scheme, cut at the
    * first '/'. Shared rendering with the oracle SQL.
    */
  private def urlHost(url: Column): Column =
    regexp_replace(regexp_replace(lower(url), "^https?://", ""), "/.*$", "")

  /** URL / domain-blocklist filtering — the C4-style hygiene step that
    * runs next to PII scrubbing: per-document URL count, the first URL's
    * lowercased host, and a 0/1 blocklist flag raised when ANY extracted
    * URL's host equals OR is a subdomain of a blocklisted domain (the
    * first clean link must not launder a later blocked one). Pure
    * per-row column work like the other text ops: the blocklist is a
    * compile-time constant folded into the predicate — at 100 TB this is
    * one scan, no shuffle, no UDF. A deployment swaps `blocked` for its
    * own list (policy knob, not an engine property); entries must be
    * lowercase.
    */
  def urlColumns(text: Column, blocked: Seq[String]): Seq[(String, Column)] = {
    val urls = regexp_extract_all(text, lit(UrlPattern), lit(0))
    def hostBlocked(h: Column): Column = blocked
      .map(d => h === d || h.endsWith("." + d))
      .reduceOption(_ || _).getOrElse(lit(false))
    Seq(
      "n_urls" -> size(urls),
      // derived from the already-extracted array — a second regexp_extract
      // over the full text would double the regex cost of the op on the
      // corpus-scan hot path (r8 advice); "" when no URL matches, same as
      // regexp_extract's no-match result
      "first_host" -> when(size(urls) > 0, urlHost(element_at(urls, 1)))
        .otherwise(lit("")),
      "url_blocked" -> exists(urls, u => hostBlocked(urlHost(u))).cast("int"))
  }

  /** Token-distribution SHANNON ENTROPY per document — the lexical-
    * diversity quality signal (machine-generated/boilerplate text is
    * low-entropy for its length; natural prose is not; a pure
    * type-token ratio misses the skew this catches): H = −Σ_types
    * (c/n)·ln(c/n) over the doc's OWN token distribution.
    *
    * ZERO-shuffle shape: a naive rendering is explode → (doc, token)
    * counts → per-doc sum — two corpus-scale Exchanges; here the whole
    * score is ONE pass of the native
    * [[graft.functions.expressions.TokenEntropyStats]] kernel per row
    * (tokenize, count, per-TYPE quantized term floor(10⁶·(c/n)·plog(c/n))
    * summed as integers), so it stays per-row column work inside
    * whole-stage codegen like every other op in this object. Per-type
    * quantization makes the integer total order-free — the DuckDB oracle
    * replays it as a plain (doc, token)-count GROUP BY with the staged
    * log chain, and a sorted-run `aggregate` fold computes the same
    * total (the kernel replaced that fold: HOFs run as CodegenFallback
    * and the interpreted portable-log dag per run boundary made this the
    * bench's slowest row at 42.7 s; the kernel runs the same IEEE ops
    * compiled).
    *
    * Output columns: n_tokens, n_types, ent_q (≤ 0), entropy =
    * −ent_q/10⁶ (one exact-input division; ln-based nats).
    */
  def entropyColumns(text: Column): Seq[(String, Column)] = {
    val st = graft.functions.expressions.TokenEntropyStats.of(text)
    Seq(
      "n_tokens" -> st.getField("n_tokens"),
      "n_types" -> st.getField("n_types"),
      "ent_q" -> st.getField("ent_q"),
      "entropy" -> ((-st.getField("ent_q")).cast("double") / lit(1.0e6)))
  }

  /** PII scrubbing for a training corpus: per-pattern match counts (on the
    * raw text) and the redacted text, with replacements applied in the
    * fixed order email → phone → IPv4 (later patterns cannot damage
    * earlier placeholders). Pure per-row column work — no shuffle, stays
    * inside whole-stage codegen, same 100 TB shape as the other text ops.
    */
  def piiColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
    "n_phones" -> size(regexp_extract_all(text, lit(PhonePattern), lit(0))),
    "n_ips" -> size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))),
    "redacted" -> regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>"))
}
