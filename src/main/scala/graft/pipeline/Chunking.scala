package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens

/** Sliding-window CHUNKING of long documents into fixed-token training
  * segments with overlap — the standard alternative to dropping or
  * truncating documents longer than the context budget (the HF-style
  * `return_overflowing_tokens` shape): chunk i covers tokens
  * [i·stride, i·stride + size); n_chunks = 1 + ceil((n − size)/stride)
  * for n > size — every chunk is full-length except possibly the last,
  * and no chunk is a pure suffix of its predecessor (the tail rule a
  * naive `while start < n` loop gets wrong) — one chunk for docs at or
  * under the budget, zero for token-less docs.
  *
  * Scale shape: pure per-row tokenize + bounded explode — no shuffle,
  * one corpus scan at 100 TB; the row multiplier is n/stride by
  * construction. Chunk arithmetic is integer-exact and engine-portable
  * (all operands non-negative, so Spark `div` ≡ DuckDB `//`).
  *
  * Output: (id, chunk_no, chunk_len, chunk_text) with chunk_text the
  * space-rejoined token window (chunking operates on the token sequence,
  * so original inter-token whitespace is normalized by construction).
  */
object Chunking {

  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("n_chunks",
        when(col("n") <= size, lit(1))
          .otherwise(expr(s"1 + (n - $size + ${stride - 1}) div $stride").cast("int")))
      .select(col(idCol), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_no"),
        col("toks"))
      .withColumn("start", col("chunk_no") * stride)
      .withColumn("chunk_len", least(lit(size), col("n") - col("start")))
      .select(col(idCol), col("chunk_no").cast("int").as("chunk_no"),
        col("chunk_len").cast("int").as("chunk_len"),
        array_join(slice(col("toks"), col("start") + 1, col("chunk_len")), " ")
          .as("chunk_text"))
  }

  /** CONTENT-DEFINED chunking — boundaries cut AFTER any token whose
    * portable hash lands in the boundary class (h mod `mask` = 0), so a
    * chunk's identity depends only on its own tokens: inserting or
    * deleting text perturbs ONLY the chunks it touches, where
    * fixed-stride chunking shifts every downstream chunk (the rsync/LBFS
    * rolling-hash trick, applied at token granularity — what makes
    * chunk-level dedup of an EDITED incremental corpus work: unchanged
    * paragraphs keep their chunk digests). Expected chunk length =
    * `mask` tokens; the boundary decision is the engine's fixed 60-bit
    * hash, so chunking is deterministic cross-engine.
    *
    * Pure per-row column work, same scale shape as [[chunkDocs]]: the
    * whole chunking is ONE pass of the native
    * [[graft.functions.expressions.CdcChunksExpr]] kernel per row
    * (tokenize, hash each token once, close chunks at boundaries) plus a
    * bounded explode — no shuffle, one scan. (The composable rendering —
    * boundary filter over token indexes, zip_with spans, slice per chunk
    * — computed the same chunks but ran every HOF lambda as
    * CodegenFallback with the hash interpreted per token: 14.2 s at
    * sf0.1 vs sub-second for the kernel.)
    * Output: (id, chunk_no, chunk_len, chunk_text); zero-token docs emit
    * nothing, a boundary on the last token does not open an empty tail.
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      mask: Int = 8): DataFrame = {
    require(mask > 0, s"boundary mask must be positive: $mask")
    df.select(col(idCol),
        posexplode(graft.functions.expressions.CdcChunksExpr
          .of(col(textCol), mask)).as(Seq("chunk_no", "chunk")))
      .select(col(idCol), col("chunk_no").cast("int").as("chunk_no"),
        col("chunk.chunk_len").as("chunk_len"),
        col("chunk.chunk_text").as("chunk_text"))
  }

  /** INCREMENTAL chunk dedup — the re-crawl shape: the ARCHIVE's chunk
    * digests and keep-first representatives derive offline (one digest
    * aggregation over the archived corpus's chunks); incoming documents
    * chunk per row ([[cdcChunks]] is pure column work, so it runs
    * unchanged on a stream) and probe the static representative table by
    * digest — a stateless stream-static left join, no watermark, no
    * state. Unknown chunks report (-1, -1, 0): genuinely new content;
    * known ones carry their archive owner — and because CDC boundaries
    * resynchronize after edits, a re-crawled page with an inserted
    * paragraph still matches every untouched chunk.
    */
  def chunkDedupAgainst(chunks: DataFrame, archiveChunks: DataFrame,
      idCol: String, chunkCol: String, textCol: String): DataFrame =
    chunkDedupAgainstReps(chunks,
      chunkDigestReps(archiveChunks, idCol, chunkCol, textCol),
      idCol, chunkCol, textCol)

  /** The archive's chunk-digest REPRESENTATIVE index — (digest, keep-
    * first (doc, chunk) struct), one row per distinct chunk text. This
    * is the persistable artifact ([[graft.dedup.IndexStore]]): derive it
    * in the nightly reconciliation job, commit it as a generation, and
    * serve [[chunkDedupAgainstReps]] from the loaded relation. The
    * keep-first struct-min is a commutative fold, so a DISJOINT
    * increment's reps fold in by union + re-min (the span-index
    * maintenance argument). */
  def chunkDigestReps(archiveChunks: DataFrame, idCol: String,
      chunkCol: String, textCol: String): DataFrame =
    archiveChunks
      .select(md5(col(textCol)).as("__d"),
        struct(col(idCol), col(chunkCol)).as("__rc"))
      .groupBy("__d").agg(min(col("__rc")).as("__rep"))

  /** [[chunkDedupAgainst]] over a pre-built (possibly LOADED) digest
    * representative index. */
  def chunkDedupAgainstReps(chunks: DataFrame, reps: DataFrame,
      idCol: String, chunkCol: String, textCol: String): DataFrame = {
    // unknown-chunk sentinel derived from the id column's own type: -1
    // for numeric ids (the family's long-id convention), NULL otherwise
    // — a string-id corpus must not silently coerce through a long lit
    val unknownDoc = chunks.schema(idCol).dataType match {
      case t: org.apache.spark.sql.types.NumericType => lit(-1L).cast(t)
      case t => lit(null).cast(t)
    }
    chunks.select(col(idCol), col(chunkCol), md5(col(textCol)).as("__d"))
      .join(reps, Seq("__d"), "left")
      .select(col(idCol), col(chunkCol),
        coalesce(col(s"__rep.$idCol"), unknownDoc).as("rep_doc"),
        coalesce(col(s"__rep.$chunkCol"), lit(-1)).cast("int").as("rep_chunk"),
        when(col("__rep").isNull, lit(0)).otherwise(lit(1))
          .cast("int").as("is_known"))
  }

  /** Packed composite chunk key: (doc_id · 2¹⁶ + chunk_no) — lets the
    * chunk rows ride the id-keyed MinHash machinery unchanged. The bound
    * is structural: CDC's expected chunk length is `mask` tokens, so 2¹⁶
    * chunks covers documents to ~½M tokens at the default mask (the
    * admission-gated maximum); the pack is mirrored in the oracle.
    * [[packedChunkKey]] guards the bound at runtime — an out-of-range
    * chunk_no or negative/NULL doc id fails LOUDLY instead of silently
    * aliasing into another document's key space (r12 advice). */
  val ChunkKeyBase: Long = 65536L

  /** The guarded pack: doc_id · [[ChunkKeyBase]] + chunk_no, with a
    * per-row raise_error on any id outside the packable range. Callers
    * must hold a NUMERIC doc id (require()d at plan build — a string id
    * would null-cast and corrupt attribution silently). */
  private def packedChunkKey(doc: Column, chunkNo: Column): Column =
    when(doc.isNull || doc < 0 || chunkNo.isNull || chunkNo < 0 ||
        chunkNo >= lit(ChunkKeyBase),
      raise_error(concat(lit("chunk key out of packable range: (doc,chunk)=("),
        coalesce(doc.cast("string"), lit("NULL")), lit(","),
        coalesce(chunkNo.cast("string"), lit("NULL")), lit(")"))).cast("long"))
      .otherwise((doc * lit(ChunkKeyBase) + chunkNo).cast("long"))

  /** CHUNK-level NEAR-dup — the production middle ground between exact
    * chunk dedup and document-level MinHash (the RefinedWeb-style
    * remedy): paragraphs that were EDITED between crawls share no digest
    * but remain near-identical, and document-level signatures dilute a
    * one-paragraph overlap below any sane threshold. Composes the two
    * existing families: [[cdcChunks]] boundaries resynchronize around
    * edits (so an edited paragraph is ONE perturbed chunk, not a shifted
    * tail), and the banded-MinHash chain generates candidates among
    * chunk texts.
    *
    * Runs over the DISTINCT-text representatives (the keep-first
    * (doc, chunk) struct-minimum per digest — exact dedup first): at
    * web scale boilerplate paragraphs repeat millions of times, and
    * banding raw chunks would put each identical group's full quadratic
    * pair set through the verify join; distinct-first bounds candidates
    * by real similarity structure. Shingles are distinct in-chunk word
    * BIGRAMS (token-SET jaccard over short chunks is hopelessly loose —
    * measured 300× denser on the test corpus); sub-2-token chunks have
    * no shingles and drop, the family's no-signature contract.
    * Verification is the fused [[graft.functions.expressions
    * .SortedJaccard]] over carried sorted shingle arrays. Output:
    * (a_doc, a_chunk, b_doc, b_chunk, jaccard ≥ threshold), exact-dup
    * representatives only — pair a < b by the packed key.
    *
    * Scale shape: one digest aggregation (the exact-dedup shuffle), one
    * signature pass (native kernels, no shuffle), the band equi-join,
    * and the verify join moving only candidate pairs — never an
    * all-pairs form.
    */
  def chunkNearDupPairs(chunks: DataFrame, idCol: String, chunkCol: String,
      textCol: String, numPerms: Int = 12, rowsPerBand: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    import graft.functions.GraftFunctions.{hash60, wordShingles}
    import graft.dedup.Dedup
    require(chunks.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packed chunk keys need a numeric doc id; $idCol is " +
        s"${chunks.schema(idCol).dataType.simpleString}")
    val reps = chunks
      .select(md5(col(textCol)).as("__d"),
        struct(col(idCol), col(chunkCol)).as("__rc"), col(textCol))
      .groupBy("__d")
      // every text under one digest is identical, so first() here is
      // deterministic in VALUE even though the row pick is not
      .agg(min(col("__rc")).as("__rc"), first(col(textCol)).as("__t"))
      .select(
        packedChunkKey(col(s"__rc.$idCol"), col(s"__rc.$chunkCol")).as("cid"),
        sort_array(wordShingles(col("__t"), 2)).as("sh"))
      .filter(size(col("sh")) > 0)
    val withSh = graft.Caches.track(reps)
    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(
        withSh.select(col("cid"), transform(col("sh"), g => hash60(g)).as("hs")),
        "cid", numPerms),
      "cid", rowsPerBand)
    Dedup.lshCandidates(bands, "cid")
      .join(withSh.select(col("cid").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(withSh.select(col("cid").as("b_id"), col("sh").as("sh_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.expressions.SortedJaccard
          .of(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(
        expr(s"a_id div $ChunkKeyBase").as("a_doc"),
        expr(s"a_id % $ChunkKeyBase").cast("int").as("a_chunk"),
        expr(s"b_id div $ChunkKeyBase").as("b_doc"),
        expr(s"b_id % $ChunkKeyBase").cast("int").as("b_chunk"),
        col("jaccard"))
  }

  /** CHUNK-level exact dedup — what content-defined chunking exists for:
    * identical chunks across documents (boilerplate paragraphs, quoted
    * passages, re-crawled pages with edits) collapse onto one
    * representative even when the surrounding documents differ, because
    * [[cdcChunks]] boundaries resynchronize after any edit. Digest
    * shuffle only (the exact-dedup scale shape — md5 of the chunk text
    * is the join key; text never shuffles beyond the digest
    * aggregation); representative = the (id, chunk_no) struct-minimum
    * per digest, the engine's keep-first rule. Output: every chunk with
    * (rep_doc, rep_chunk, is_dup).
    */
  def chunkDedup(chunks: DataFrame, idCol: String,
      chunkCol: String, textCol: String): DataFrame = {
    val dg = chunks.select(col(idCol), col(chunkCol),
      md5(col(textCol)).as("__d"))
    val reps = dg.groupBy("__d")
      .agg(min(struct(col(idCol), col(chunkCol))).as("__rep"))
    dg.join(reps, "__d")
      .select(col(idCol), col(chunkCol),
        col(s"__rep.$idCol").as("rep_doc"),
        col(s"__rep.$chunkCol").as("rep_chunk"),
        when(col(s"__rep.$idCol") === col(idCol) &&
          col(s"__rep.$chunkCol") === col(chunkCol), lit(0))
          .otherwise(lit(1)).cast("int").as("is_dup"))
  }
}
