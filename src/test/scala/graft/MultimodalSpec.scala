package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Media

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mapPartitions feature extraction matches column-expression twin") {
    import spark.implicits._
    val media = Media.fromText(Tables.documents(spark, TestSpark.SF), "doc_id", "text")
      .as[Media.MediaRow]
    val feats = Media.extractFeatures(media)(spark)
      .select(col("media_id"), col("n_bytes"), col("content_md5")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val twin = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), length(col("text")).cast("long"), md5(col("text"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(feats.sameElements(twin))
  }

  test("frame sampling yields bounded deterministic offsets") {
    import spark.implicits._
    val media = Media.fromText(Tables.documents(spark, TestSpark.SF), "doc_id", "text")
      .as[Media.MediaRow]
    val frames = Media.sampleFrames(media, stride = 50, maxFrames = 4)(spark)
    assert(frames.groupBy("media_id").count().agg(max("count")).collect()(0).getLong(0) <= 4)
    assert(frames.filter(col("byte_offset") % 50 =!= 0).count() == 0)
  }

  test("dhash: hand-computed signature, locality under a small edit, degenerates") {
    import spark.implicits._
    implicit val s = spark
    // ramp signal: 61 buckets of a strictly increasing byte sequence →
    // every adjacent mean comparison is TRUE → all 60 bits set
    val ramp = Array.tabulate(122)(i => i.toByte)
    val base = "a" * 400 + "b" * 400 // step signal, stable gradients
    val edited = "zzz" + base.substring(3) // length-preserving local edit
    val rows = Seq(
      Media.MediaRow(1L, ramp, "application/octet-stream", 0, 0, 0L),
      Media.MediaRow(2L, base.getBytes("UTF-8"), "text/plain", 0, 0, 0L),
      Media.MediaRow(3L, edited.getBytes("UTF-8"), "text/plain", 0, 0, 0L),
      Media.MediaRow(4L, Array.emptyByteArray, "text/plain", 0, 0, 0L)
    ).toDS()
    val sigs = Media.dhashStub(rows)(spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == (1L << 60) - 1L, "ramp must set all 60 gradient bits")
    assert(sigs(4L) == 0L, "empty payload signs 0")
    val hamming = java.lang.Long.bitCount(sigs(2L) ^ sigs(3L))
    assert(hamming <= 3,
      s"a 3-byte local edit must flip at most a few gradient bits: $hamming")
    assert(sigs(2L) != sigs(3L) || hamming == 0)
  }
}
