package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata (SURVEY §7 M9 / builder north star).
  *
  * The Spark-side plumbing — schema, partition-parallel batch transform,
  * deterministic feature extraction — is real and tested; the actual
  * codec decode is STUBBED (no image/audio libraries in this container)
  * behind [[MediaCodec.decodeStub]], which derives a deterministic fake
  * "decoded" signal from the bytes so pipelines are end-to-end testable.
  *
  * Scale notes: media transforms run as `mapPartitions` over the typed
  * Dataset — one codec context per partition (the expensive part),
  * streaming through rows without materializing a partition in memory.
  * Binary payloads never enter a shuffle here; only extracted features
  * (small fixed-width arrays) flow downstream.
  */
object Media {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      data: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Extracted features: fixed-width, shuffle-friendly. */
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      content_md5: String,
      byte_hist: Array[Long], // 16-bin histogram of (byte & 0x0f)
      mean_byte: Double)

  /** Wrap a text table as a media table (the container has no real media
    * files; UTF-8 bytes stand in for an encoded payload).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("data"),
      lit("text/plain").as("mime"),
      lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))

  object MediaCodec {
    /** STUB — stands in for a real image/audio decode (libs unavailable in
      * this container). Deterministic on the payload bytes so tests and
      * oracles are stable. A real deployment swaps this for e.g. a JNI
      * codec initialized once per partition.
      */
    def decodeStub(data: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < data.length) { hist(data(i) & 0x0f) += 1; i += 1 }
      hist
    }
  }

  /** Partition-parallel feature extraction: one "codec" per partition,
    * rows streamed. This is the canonical shape for real decoders.
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive, amortized)
      rows.map { r =>
        val hist = MediaCodec.decodeStub(r.data)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.data).map("%02x".format(_)).mkString
        val sum = r.data.foldLeft(0L)((a, b) => a + (b & 0xff))
        MediaFeatures(r.media_id, r.data.length.toLong, md, hist,
          if (r.data.length == 0) 0.0 else sum.toDouble / r.data.length)
      }
    }
  }

  /** Resize stub: bucket-mean downsample of the byte signal to `bins`
    * fixed-width doubles — stands in for an image resize / audio
    * resample (codec libs unavailable here), keeping the real pipeline
    * shape: opaque bytes in, small fixed-width feature vector out, binary
    * never shuffles. Bucket boundaries use exact integer arithmetic
    * ((i·n) div bins) so the DuckDB oracle reproduces them bit-for-bit.
    */
  def resizeStub(media: Dataset[MediaRow], bins: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.map { r =>
      val n = r.data.length
      val out = new Array[Double](bins)
      var i = 0
      while (i < bins) {
        val s = (i.toLong * n / bins).toInt
        val e = ((i + 1).toLong * n / bins).toInt
        var acc = 0L
        var j = s
        while (j < e) { acc += (r.data(j) & 0xff); j += 1 }
        out(i) = if (e > s) acc.toDouble / (e - s) else 0.0
        i += 1
      }
      (r.media_id, out)
    }.toDF("media_id", "bins")
  }

  /** dHash signature width — 60 bits keeps the signature strictly
    * positive in int64 (the cross-engine convention; bit 63 would wrap
    * sign in one engine's sum and not the other's) and splits into the
    * dedup family's standard 4 × 15-bit hamming bands. */
  val DhashBits: Int = 60

  /** Perceptual difference hash (dHash) over the byte signal — the
    * image-dedup standard (gradient direction between adjacent resize
    * cells) applied to the deterministic bucket-mean features
    * [[resizeStub]] produces: downsample to bits+1 buckets, bit i set
    * iff bucket i+1's mean exceeds bucket i's. The comparison is decided
    * in EXACT integers (cross-multiplied sums — acc·cnt stays far below
    * int64 at any payload this path admits), so no double division ever
    * enters the signature and the DuckDB oracle replays it bit-for-bit.
    * A real deployment swaps the byte signal for decoded luma rows; the
    * banding/verify machinery downstream is unchanged.
    */
  def dhashStub(media: Dataset[MediaRow], bits: Int = DhashBits)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.map { r =>
      val n = r.data.length
      val bins = bits + 1
      val acc = new Array[Long](bins)
      val cnt = new Array[Long](bins)
      var i = 0
      while (i < bins) {
        val s = (i.toLong * n / bins).toInt
        val e = ((i + 1).toLong * n / bins).toInt
        var a = 0L
        var j = s
        while (j < e) { a += (r.data(j) & 0xff); j += 1 }
        acc(i) = a
        cnt(i) = (e - s).toLong
        i += 1
      }
      var sig = 0L
      i = 0
      while (i < bits) {
        // mean_{i+1} > mean_i as exact integer cross-multiplication
        if (acc(i + 1) * cnt(i) > acc(i) * cnt(i + 1)) sig |= (1L << i)
        i += 1
      }
      (r.media_id, sig)
    }.toDF("media_id", "dhash")
  }

  /** Frame sampling stub for video payloads: picks deterministic byte
    * offsets standing in for frame boundaries (every `stride` bytes, up to
    * `maxFrames`), preserving the mapPartitions batch shape a real
    * frame-decoder would use.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, maxFrames: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      val n = math.min(maxFrames, if (stride <= 0) 0 else r.data.length / stride)
      (0 until n).map { f =>
        val off = f * stride
        (r.media_id, f, off, (r.data(off) & 0xff))
      }
    }.toDF("media_id", "frame", "byte_offset", "first_byte")
  }
}
