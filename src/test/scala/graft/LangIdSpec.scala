package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.LangId

/** Trained K-class language ID: feature buckets replayed independently
  * (codepoint trigram windows + the portable hash), separation on
  * planted vocabularies, the pinned argmax tie rule, partitioning
  * invariance of the trained weights, and the persistence round trip.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    // three planted "languages" with accented (multibyte) class markers
    // over a shared ASCII filler, labels = doc_id % 3
    Seq(
      (0L, "shared filler text the and with would"),
      (1L, "shared filler text der über größe schön"),
      (2L, "shared filler text le été déjà où être"),
      (3L, "more shared words the would should through"),
      (4L, "more shared words während straße über und"),
      (5L, "more shared words français ainsi déjà été"),
      (6L, "the and would through shared"),
      (7L, "der und über schön shared"),
      (8L, "le avec été où shared")
    ).toDF("doc_id", "text")
  }

  test("feature buckets replay independently (codepoint windows, portable hash)") {
    import spark.implicits._
    val docs = Seq((1L, "abçd")).toDF("doc_id", "text") // ç is 2 UTF-8 bytes
    val fx = LangId.features(docs, "doc_id", "text", lit(0))
      .select(col("fx")).head().getSeq[org.apache.spark.sql.Row](0)
    val want = Seq("abç", "bçd")
      .map(g => (graft.functions.GraftFunctions.hash60Scala(g) %
        LangId.Buckets).toInt)
      .distinct.sorted
    assert(fx.map(_.getLong(0)) == (want.map(_.toLong) :+ LangId.Buckets.toLong),
      "sorted distinct codepoint-trigram buckets + trailing bias")
    assert(fx.forall(_.getLong(1) == 1L), "presence features are c = 1")
    // sub-n strings and NULL text get bias-only features
    val tiny = Seq((1L, "ab"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    LangId.features(tiny, "doc_id", "text", lit(0)).collect().foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0)) ==
        Seq(LangId.Buckets.toLong))
    }
  }

  test("planted languages separate perfectly; loaded model scores identically") {
    val feats = graft.Caches.track(LangId.features(
      corpus, "doc_id", "text", pmod(col("doc_id"), lit(3))))
    try {
      val m = LangId.train(feats, 3)
      val got = LangId.score(feats, "doc_id", m)
        .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getInt(1))
      got.foreach { case (id, lang) =>
        assert(lang == (id % 3).toInt, s"doc $id predicted $lang")
      }
      val root = java.nio.file.Files
        .createTempDirectory("graft-langid").toString + "/m"
      LangId.save(spark, m, root)
      val lm = LangId.load(spark, root)
      assert(lm.w.map(_.toSeq).toSeq == m.w.map(_.toSeq).toSeq,
        "weights must round-trip bit-exactly")
    } finally Caches.releaseAll()
  }

  test("argmax ties resolve to the SMALLEST class index") {
    import spark.implicits._
    // zero weights → all margins equal (pure tie) → class 0 everywhere
    val m = LangId.Model(Array.fill(3, LangId.Buckets + 1)(0.0))
    val feats = LangId.features(corpus, "doc_id", "text", lit(0))
    val langs = LangId.score(feats, "doc_id", m).select("lang")
      .collect().map(_.getInt(0)).toSet
    assert(langs == Set(0), "a full tie must resolve to class 0")
  }

  test("trained weights are partitioning-invariant (quantized gradients)") {
    val f1 = graft.Caches.track(LangId.features(
      corpus.repartition(1), "doc_id", "text", pmod(col("doc_id"), lit(3))))
    val f7 = graft.Caches.track(LangId.features(
      corpus.repartition(7), "doc_id", "text", pmod(col("doc_id"), lit(3))))
    try {
      val w1 = LangId.train(f1, 3).w.map(_.toSeq).toSeq
      val w7 = LangId.train(f7, 3).w.map(_.toSeq).toSeq
      assert(w1 == w7)
    } finally Caches.releaseAll()
  }
}
