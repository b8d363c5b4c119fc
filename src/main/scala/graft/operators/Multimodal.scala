package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (north-star surface): media are opaque
  * `BinaryType` columns plus typed metadata; decode / feature-extraction
  * runs as a partition-local transform so each executor touches only its
  * partition's bytes (no shuffle, no driver materialization).
  *
  * Image decode is REAL for everything the JDK ships codecs for
  * (PNG/JPEG/GIF/BMP): `imageMeta` reads width/height/format from the
  * header, and the feature vector is a deterministic 8-bin luminance
  * histogram over the actual decoded pixels (`luminanceHistogram` —
  * integer Rec.601 luma, so the same bytes always bin identically).
  * Audio/video and undecodable payloads fall back to `fakeDecode`, a
  * clearly-marked DETERMINISTIC FAKE (the container ships no further
  * codecs); the Spark-side plumbing — schema, encoder, mapPartitions
  * batch shape, partitioning — is what an ffmpeg-backed decoder would
  * slot into.
  */
object Multimodal {

  /** Real header-only image metadata: (format, width, height), or None if
    * the bytes are not a JDK-recognizable image. */
  def imageMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.length < 8) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } finally iis.close()
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Build a media table from `documents` by treating the UTF-8 bytes as
    * opaque binary payloads — stands in for real image/audio blobs. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Util.t(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      concat(lit("image/fake-"), col("source")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** Deterministic 8-bin luminance histogram over decoded pixels: integer
    * Rec.601 luma `(299R + 587G + 114B) / 1000` ∈ [0, 255], bin =
    * `luma * bins / 256`, normalized by pixel count. Integer arithmetic
    * end-to-end, so the feature is bit-stable across JVMs/platforms. */
  def luminanceHistogram(img: java.awt.image.BufferedImage, bins: Int = 8): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val counts = new Array[Long](bins)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        counts(luma * bins / 256) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    counts.map(c => c / n)
  }

  /** Full pixel decode → luminance-histogram feature, or None when the JDK
    * has no codec for the payload. */
  def imageFeature(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.length < 8) return None
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .map(luminanceHistogram(_))
    catch { case _: java.io.IOException => None }
  }

  /** STUB DECODER — deterministic fake for NON-IMAGE payloads only (audio/
    * video: the container ships no codecs). A real implementation would
    * call a media library here (per-partition, reusing a decoder
    * instance); everything around this function is production-shaped. */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 64 + (if (n == 0) 0 else math.abs(bytes(0).toInt) % 64)
    val height = 64 + (if (n < 2) 0 else math.abs(bytes(1).toInt) % 64)
    val feature = new Array[Float](8)
    var i = 0
    while (i < n) { feature(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    (width, height, feature)
  }

  /** Partition-local decode: one decoder per partition, streaming rows.
    * JDK-decodable images get real header dimensions (and their sniffed
    * format as media_type) plus a REAL pixel-derived luminance-histogram
    * feature; only undecodable payloads keep the fake decoder's
    * deterministic outputs. */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "media_type", "content").mapPartitions { it =>
      // per-partition decoder init would go here (native handles, etc.)
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
        imageMeta(bytes) match {
          case Some((fmt, w, h)) =>
            val f = imageFeature(bytes).getOrElse(fakeDecode(bytes)._3)
            Row(r.getLong(0), s"image/$fmt", bytes.length.toLong, w, h, f.toSeq)
          case None =>
            val (w, h, f) = fakeDecode(bytes)
            Row(r.getLong(0), r.getString(1), bytes.length.toLong, w, h, f.toSeq)
        }
      }
    }(enc)
  }
}
