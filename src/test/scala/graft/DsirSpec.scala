package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Dsir
import graft.functions.GraftFunctions

/** DSIR importance scoring: portable-log fidelity, a hand-replayed
  * fit/score case, selection equivalence with the naive global sort, and
  * partitioning-invariance of the integer score fold.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("plog approximates ln to ~1e-8 relative and is exactly 0 at 1") {
    assert(Dsir.plog(1.0) == 0.0)
    for (x <- Seq(1e-12, 1e-9, 1e-6, 1e-3, 0.1, 0.5, 0.9, 0.999, 1.5, 10.0)) {
      val want = math.log(x)
      val got = Dsir.plog(x)
      val tol = 1e-8 * math.max(1.0, math.abs(want))
      assert(math.abs(got - want) <= tol,
        s"plog($x) = $got vs ln = $want (tol $tol)")
    }
  }

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "good prose here"), // target
      (2L, "good prose here"), // raw copy of the target text → high score
      (3L, "junk junk junk"),
      (4L, "")
    ).toDF("doc_id", "text")
  }

  test("fit + score replay by hand (independent hashing and plog path)") {
    val m = Dsir.fit(corpus, "text", col("doc_id") === 1L)
    // independent replay: hash grams driver-side, count, apply the formula
    def grams(t: String): Seq[String] = {
      val toks = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSeq
      toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val docs = Map(1L -> "good prose here", 2L -> "good prose here",
      3L -> "junk junk junk", 4L -> "")
    def bucket(g: String): Int =
      (GraftFunctions.hash60Scala(g) % Dsir.Buckets).toInt
    val ct = new Array[Long](Dsir.Buckets)
    val cr = new Array[Long](Dsir.Buckets)
    docs.foreach { case (id, t) =>
      grams(t).foreach { g =>
        cr(bucket(g)) += 1
        if (id == 1L) ct(bucket(g)) += 1
      }
    }
    assert(m.ct.toSeq == ct.toSeq, "target bucket counts")
    assert(m.cr.toSeq == cr.toSeq, "raw bucket counts")
    val nt = ct.sum; val nr = cr.sum
    val wantQlr = Array.tabulate(Dsir.Buckets) { b =>
      math.floor(Dsir.QlrScale *
        (Dsir.plog((ct(b) + 1L).toDouble / (nt + Dsir.Buckets).toDouble) -
          Dsir.plog((cr(b) + 1L).toDouble / (nr + Dsir.Buckets).toDouble))).toLong
    }
    assert(m.qlr.toSeq == wantQlr.toSeq)

    val scored = Dsir.score(corpus, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def wantScore(t: String): Long = grams(t).map(g => m.qlr(bucket(g))).sum
    assert(scored(1L) == ((5L, wantScore("good prose here"))))
    assert(scored(2L) == scored(1L), "identical text scores identically")
    assert(scored(3L) == ((5L, wantScore("junk junk junk"))))
    assert(scored(4L) == ((0L, 0L)), "zero-gram docs score (0, 0)")
    // the target's own text must outscore the off-target text
    assert(scored(1L)._2 > scored(3L)._2)
  }

  test("selectTopK equals the naive global sort + limit") {
    val m = Dsir.fit(corpus, "text", col("doc_id") === 1L)
    val scored = Dsir.score(corpus, "doc_id", "text", m)
    val got = Dsir.selectTopK(scored, "doc_id", 2L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = scored.orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(2).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // at 4-doc scale the add-one smoothing over 1024 buckets dominates
    // (every text score is slightly negative), so the zero-gram doc's 0
    // ranks first and the (score, id) tiebreak picks doc 1 over its copy —
    // exactly what the naive sort computes too
    assert(got == Seq(1L, 4L))
  }

  test("NULL text scores (0, 0) like empty text (PERMISSIVE-parsed rows)") {
    import spark.implicits._
    val m = Dsir.fit(corpus, "text", col("doc_id") === 1L)
    val withNull = Seq((20L, null.asInstanceOf[String]), (21L, "")).toDF("doc_id", "text")
    val got = Dsir.score(withNull, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(20L) == ((0L, 0L)) && got(21L) == ((0L, 0L)),
      "a clean-parsed JSONL row missing the text field must score, not null out")
  }

  test("native kernel ≡ the composable HOF fold it replaced (spec of equivalence)") {
    import spark.implicits._
    import graft.functions.GraftFunctions._
    val m = Dsir.fit(corpus, "text", col("doc_id") === 1L)
    val docs = (corpus.select(col("doc_id"), col("text")) union Seq(
      (30L, "single"),                    // 1 token → n_grams = 1, no bigram
      (31L, "a b"),                       // minimal bigram
      (32L, "x\u000By tab\tsplit  wide"), // vertical tab + multi-ws
      (33L, "UPPER lower UPPER lower")    // case fold + repeated grams
    ).toDF("doc_id", "text")).toDF("doc_id", "text")
    val kernel = Dsir.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // the retired rendering, verbatim
    val qarr = typedLit(m.qlr.toSeq)
    val hof = docs
      .select(col("doc_id"), Dsir.gramsCol(col("text")).as("__grams"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("__grams")).cast("long").as("n_grams"),
        aggregate(col("__grams"), lit(0L),
          (acc, g) => acc + element_at(qarr, (Dsir.bucketCol(g) + 1L).cast("int")))
          .as("dsir_score"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(kernel == hof, "kernel and HOF fold must be value-identical")
  }

  test("merge over disjoint slices ≡ fit on the union, to the bit") {
    import org.apache.spark.sql.functions._
    val tgt = col("doc_id") === 1L
    val union = Dsir.fit(corpus, "text", tgt)
    val merged = Dsir.merge(
      Dsir.fit(corpus.filter(pmod(col("doc_id"), lit(2)) === 0), "text", tgt),
      Dsir.fit(corpus.filter(pmod(col("doc_id"), lit(2)) === 1), "text", tgt))
    assert(merged.nt == union.nt && merged.nr == union.nr)
    assert(merged.ct.toSeq == union.ct.toSeq && merged.cr.toSeq == union.cr.toSeq)
    assert(merged.qlr.toSeq == union.qlr.toSeq,
      "re-derived log-ratios must be bit-identical to the union fit's")
  }

  test("score is partitioning-invariant (integer fold, plan-literal model)") {
    val m = Dsir.fit(corpus, "text", col("doc_id") === 1L)
    val a = Dsir.score(corpus.repartition(1), "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Dsir.score(corpus.repartition(7), "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
