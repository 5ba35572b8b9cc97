package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.text.TextAnalysis

/** Degenerate inputs the synthetic corpus never exercises: empty text,
  * whitespace-only, fewer tokens than the shingle width, short strings,
  * unicode. None of these may throw or emit nulls where the contract says
  * zero/empty.
  */
class TextEdgeCasesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, ""),
      (1L, "   "),
      (2L, "one"),
      (3L, "two words"),
      (4L, "exactly three words"),
      (5L, "punctuation, only: !?;."),
      (6L, "这 是 中文 的 测试 文本"),
      (7L, "The the THE tHe")
    ).toDF("doc_id", "text")
  }

  test("tokens / shingles handle empty and short inputs") {
    val rows = docs.select(col("doc_id"),
      size(tokens(col("text"))).as("nt"),
      size(wordShingles(col("text"), 3)).as("ns")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(rows(0L) == ((0, 0)) && rows(1L) == ((0, 0)))
    assert(rows(2L) == ((1, 0)) && rows(3L) == ((2, 0)))
    assert(rows(4L) == ((3, 1)))
    assert(rows(7L)._1 == 4)
  }

  test("quality / langid / fingerprint never throw or null on degenerates") {
    val q = docs.select(
      col("doc_id") +:
        TextAnalysis.langId(col("text")).as("lang") +:
        TextAnalysis.qualityColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
    val got = q.collect()
    assert(got.length == 8)
    got.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("quality_score")))
      assert(r.getDouble(r.fieldIndex("quality_score")) >= 0.0)
    }
    val zh = got.find(_.getLong(0) == 6L).get
    assert(zh.getString(zh.fieldIndex("lang")) == "zh")
    val (fp, ng) = TextAnalysis.fingerprint(col("text"), 8)
    val fps = docs.select(col("doc_id"), fp.as("fp"), ng.as("ng")).collect()
    assert(fps.count(_.isNullAt(1)) == 3) // texts shorter than 8 chars → null fp
  }

  test("repetition stats: hand-computed values and zero on degenerates") {
    import spark.implicits._
    val d = (docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq :+
      (8L, "a b a b a c")).toDF("doc_id", "text")
    val got = d.select(
      col("doc_id") +:
        TextAnalysis.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // empty / whitespace-only: everything zero
    assert(got(0L) == ((0L, 0.0, 0.0, 0.0)) && got(1L) == ((0L, 0.0, 0.0, 0.0)))
    // single token: no grams, top token is 1/1
    assert(got(2L) == ((1L, 0.0, 0.0, 1.0)))
    // "The the THE tHe" lowercases to 4× "the": bigrams = 3 total /
    // 1 distinct → (3−1)/3, trigrams = 2 total / 1 distinct → 1/2,
    // top token = 4/4
    assert(got(7L) == ((4L, 2.0 / 3.0, 0.5, 1.0)))
    // "a b a b a c": bigrams [ab, ba, ab, ba, ac] → 2 dup of 5; trigrams
    // [aba, bab, aba, bac] → 1 dup of 4; 'a' appears 3 of 6
    assert(got(8L) == ((6L, 2.0 / 5.0, 1.0 / 4.0, 0.5)))
  }

  test("dedup pipelines tolerate degenerate corpora") {
    val pairs = graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
    assert(pairs.count() == 0) // no doc pair shares 3-gram shingles
    val sims = graft.dedup.Dedup.simhash(docs, "doc_id", "text")
    assert(sims.count() == 6) // empty/whitespace docs have no tokens
  }
}
