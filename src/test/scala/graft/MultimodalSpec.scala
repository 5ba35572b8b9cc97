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
}
