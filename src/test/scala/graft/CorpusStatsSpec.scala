package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{CorpusStats, TextAnalysis}

/** Hand-computed cases for the corpus-frequency scorer and the line-wise
  * cleaner (the declared rows run over the synthetic corpus; these pin the
  * arithmetic on inputs small enough to verify by hand).
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "solo"),
      (4L, "")
    ).toDF("doc_id", "text")
  }

  test("df-score: document frequencies, mean df and hapax ratio by hand") {
    // df: apple→1, banana→2, cherry→1, solo→1
    val got = CorpusStats.dfScore(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((3L, 4L, 4.0 / 3.0, 2.0 / 3.0)),
      "doc 1: [apple, banana, apple] → sum_df 1+2+1, hapax 2 of 3")
    assert(got(2L) == ((2L, 3L, 1.5, 0.5)))
    assert(got(3L) == ((1L, 1L, 1.0, 1.0)), "a hapax-only doc scores ratio 1")
    assert(got(4L) == ((0L, 0L, 0.0, 0.0)), "zero-token docs survive with zeros")
  }

  test("guarded vocabulary join: the fallback strategy is result-identical") {
    val bcast = CorpusStats.dfScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fallback = CorpusStats.dfScore(docs, "doc_id", "text", maxBroadcastVocab = 0L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(bcast == fallback)
  }

  test("line clean: boilerplate and short lines drop, ratio is exact") {
    import spark.implicits._
    val d = Seq(
      (1L, "Click Here\nA real sentence that stays.\ntiny"),
      (2L, "HOME | About | Contact"), // boilerplate only → everything drops
      (3L, "")
    ).toDF("doc_id", "text")
    val cols = TextAnalysis.lineCleanColumns(col("text")).map { case (n, c) => c.as(n) }
    val got = d.select(col("doc_id") +: cols: _*)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getDouble(4)))).toMap
    val keptLen = "A real sentence that stays.".length.toDouble
    val totalLen = "Click Here\nA real sentence that stays.\ntiny".length.toDouble
    assert(got(1L) == ((3, 1, "A real sentence that stays.", keptLen / totalLen)))
    assert(got(2L) == ((1, 0, "", 0.0)), "case-insensitive boilerplate match")
    assert(got(3L)._4 == 0.0, "empty doc: ratio guards the 0/0")
  }
}
