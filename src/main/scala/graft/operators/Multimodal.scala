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
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE decoder: it derives (width, height,
  * n_frames) and a small feature vector from the raw bytes. The Spark-side
  * plumbing — schema, encoder, mapPartitions batch shape, partitioning —
  * is real and is what a libjpeg/ffmpeg-backed decoder would slot into.
  */
object Multimodal {

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

  /** STUB DECODER — deterministic fake. A real implementation would call an
    * image/audio library here (per-partition, reusing a decoder instance);
    * everything around this function is production-shaped. */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 64 + (if (n == 0) 0 else math.abs(bytes(0).toInt) % 64)
    val height = 64 + (if (n < 2) 0 else math.abs(bytes(1).toInt) % 64)
    val feature = new Array[Float](8)
    var i = 0
    while (i < n) { feature(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    (width, height, feature)
  }

  /** Partition-local decode: one decoder per partition, streaming rows. */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "media_type", "content").mapPartitions { it =>
      // per-partition decoder init would go here (native handles, etc.)
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
        val (w, h, f) = fakeDecode(bytes)
        Row(r.getLong(0), r.getString(1), bytes.length.toLong, w, h, f.toSeq)
      }
    }(enc)
  }
}
