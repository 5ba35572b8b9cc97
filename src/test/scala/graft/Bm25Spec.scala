package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PortableLog
import graft.text.Bm25

class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("BM25 scores replay driver-side; rare-term queries retrieve their source; invariance") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry date date date"),
      (3L, "apple apple apple apple banana zebra"),
      (4L, "unrelated words entirely here"),
      (5L, "cherry date"))
      .toDF("doc_id", "text")
    val queries = Seq((100L, "apple date"), (200L, "zebra")).toDF("qid", "qtext")
    val got = Bm25.topk(corpus, "doc_id", "text", queries, "qid", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // independent driver-side replay of the whole dag
    val docs = Map(1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "date", "date", "date"),
      3L -> Seq("apple", "apple", "apple", "apple", "banana", "zebra"),
      4L -> Seq("unrelated", "words", "entirely", "here"),
      5L -> Seq("cherry", "date"))
    val n = docs.size.toLong
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / n.toDouble
    def df(t: String) = docs.values.count(_.contains(t)).toLong
    def contrib(t: String, d: Long): Long = {
      val tf = docs(d).count(_ == t).toLong
      if (tf == 0) 0L
      else {
        val idf = PortableLog.plog(
          (n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5) + 1.0)
        val dl = docs(d).size.toLong
        math.floor(1.0e6 * (idf * ((tf.toDouble * 2.2) /
          (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))))).toLong
      }
    }
    def want(qts: Seq[String]) = docs.keys.toSeq
      .map(d => d -> qts.distinct.map(t => contrib(t, d)).sum)
      .filter { case (d, s) => qts.distinct.exists(t => docs(d).contains(t)) }
      .sortBy { case (d, s) => (-s, d) }
    val w100 = want(Seq("apple", "date"))
    w100.zipWithIndex.foreach { case ((d, s), i) =>
      assert(got((100L, i + 1)) == ((d, s)), s"query 100 rank ${i + 1}")
    }
    assert(got((200L, 1))._1 == 3L, "the only zebra doc must rank first")
    // partitioning invariance
    val again = Bm25.topk(corpus.repartition(7), "doc_id", "text",
        queries.repartition(3), "qid", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again == got)
  }

  test("planted rare markers give perfect self-retrieval (the idf mechanism)") {
    import spark.implicits._
    // 60 docs over a tiny shared vocabulary + one unique marker each;
    // queries = shared words + the marker: idf must make the source doc
    // rank 1 for every query
    val corpus = (1 to 60).map(i =>
      (i.toLong, s"w${i % 5} w${i % 7} w${i % 3} mark$i")).toDF("doc_id", "text")
    val queries = (1 to 60).filter(_ % 6 == 0).map(i =>
      (i.toLong, s"w${i % 5} mark$i")).toDF("qid", "qtext")
    val got = Bm25.topk(corpus, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(got.length == 10 && got.forall { case (q, d) => q == d },
      s"every query must retrieve its source doc first: ${got.toSeq}")
  }

  test("streaming scorer equals the batch scored relation term for term") {
    import spark.implicits._
    implicit val sp = spark
    val corpus = (1 to 80).map(i =>
      (i.toLong, s"w${i % 5} w${i % 7} w${i % 5} w${i % 3} mark$i")).toDF("doc_id", "text")
    val queries = Seq((6L, "w1 w3 mark6"), (14L, "w4 mark14")).toDF("qid", "qtext")
    // batch relation: the pre-rank (query, doc, score) aggregation
    val want = Bm25.topk(corpus, "doc_id", "text", queries, "qid", "qtext",
        k = 1000)
      .select("query_id", "doc_id", "score_q")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val root = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    try {
      corpus.repartition(3).write.mode("overwrite").parquet(s"$root/in")
      val stream = spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val scored = Bm25.streamScored(stream,
        spark.read.parquet(s"$root/in"), "doc_id", "text", queries, "qid", "qtext")
      val got = graft.streaming.StreamRun.toBatch(
          scored, "append", numPartitions = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, "streamed scores must equal the batch relation")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("query terms absent from the archive drop, matching the batch join") {
    import spark.implicits._
    implicit val sp = spark
    // the production case: an eval query carrying a token the archived
    // corpus never contains — the model must drop it (as the batch token
    // join does), not throw on the idf lookup
    val corpus = (1 to 40).map(i =>
      (i.toLong, s"w${i % 5} w${i % 7} mark$i")).toDF("doc_id", "text")
    val queries = Seq((1L, "w1 neverinarchive mark6"), (2L, "totallyoov"))
      .toDF("qid", "qtext")
    val want = Bm25.topk(corpus, "doc_id", "text", queries, "qid", "qtext",
        k = 1000)
      .select("query_id", "doc_id", "score_q")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty && want.keys.forall(_._1 == 1L),
      "query 2 is all-OOV and must retrieve nothing")
    val root = java.nio.file.Files.createTempDirectory("graft-bm25oov").toString
    try {
      corpus.repartition(2).write.mode("overwrite").parquet(s"$root/in")
      val stream = spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val scored = Bm25.streamScored(stream,
        spark.read.parquet(s"$root/in"), "doc_id", "text", queries, "qid", "qtext")
      val got = graft.streaming.StreamRun.toBatch(
          scored, "append", numPartitions = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, "OOV-bearing queries must score as the batch path")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
