package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
