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
  * Audio is REAL for WAV (RIFF walk + PCM16 decode below); multi-frame
  * decode is REAL for animated GIF (`gifFrames` — every frame's pixels
  * via the JDK reader) AND for MJPEG-in-AVI video (`aviFrames` — RIFF
  * chunk walk + per-frame JDK JPEG decode, the one true-video codec
  * class the JDK can fully handle). Inter-frame codecs (H.264 etc.) and
  * undecodable payloads fall back to `fakeDecode`, a clearly-marked
  * DETERMINISTIC FAKE (the container ships no further codecs); the
  * Spark-side plumbing — schema, encoder, mapPartitions batch shape,
  * partitioning — is what an ffmpeg-backed decoder would slot into.
  */
object Multimodal {

  // ImageIO's default image input/output streams are DISK-CACHE backed:
  // every createImageInputStream/write call materializes a temp file,
  // so a 32-thread decode stage turns into temp-dir churn (measured at
  // sf1: widening q106 from 10-way to 32-way made it 2.2× SLOWER until
  // this flag; with memory-backed streams the same widening is a win).
  // JVM-global, runs once per executor when the closure first touches
  // this object.
  javax.imageio.ImageIO.setUseCache(false)

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
    // NonFatal, not just IOException: corrupt payloads can throw
    // CMMException/ArrayIndexOutOfBounds from inside the JDK decoders
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .map(luminanceHistogram(_))
    catch { case scala.util.control.NonFatal(_) => None }
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

  // ------------------------------------------------------------- resize

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("content", BinaryType, nullable = true)))

  /** Deterministic nearest-neighbor downscale so the longest side is
    * `maxDim` (no-op for smaller images), re-encoded as PNG. Integer
    * source-pixel lookup — no filtering kernels — so the same input bytes
    * produce the same output bytes on every JVM. */
  def resizeImage(img: java.awt.image.BufferedImage, maxDim: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val long = math.max(w, h)
    if (long <= maxDim) return img
    val nw = math.max(1, w * maxDim / long)
    val nh = math.max(1, h * maxDim / long)
    val out = new java.awt.image.BufferedImage(nw, nh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        out.setRGB(x, y, img.getRGB(x * w / nw, y * h / nh))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Partition-local image resize: JDK-decodable payloads are downscaled
    * and re-encoded (PNG); everything else passes through untouched with
    * its original bytes — a media pipeline never drops rows on decode
    * failure, it routes them. No shuffle; each executor resizes only its
    * partition's bytes. */
  def resizeImages(media: DataFrame, maxDim: Int = 256): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select("media_id", "media_type", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
        val decoded =
          // route-don't-drop: malformed images can throw RuntimeExceptions
          // (CMMException on corrupt ICC profiles etc.), not just IOException
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(img) =>
            val small = resizeImage(img, maxDim)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(small, "png", bos)
            Row(r.getLong(0), small.getWidth, small.getHeight, bos.toByteArray)
          case None =>
            Row(r.getLong(0), null, null, bytes)
        }
      }
    }(enc)
  }

  // -------------------------------------------------------- frame sample

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = true)))

  /** Video frame sampling PLUMBING: one output row per sampled frame,
    * emitted by a partition-local flatMap (the 1→N explode shape a real
    * ffmpeg-backed sampler uses — decoder init per partition, frames
    * streamed, nothing collected). The container ships no video codec, so
    * the frame PAYLOAD is a DETERMINISTIC FAKE (a byte slice of the
    * source at the frame's notional offset, like [[fakeDecode]]); the
    * schema, timestamps, cadence, and partitioning are production-shaped.
    * Images (decodable stills) emit exactly one frame at t=0 with their
    * real bytes. */
  /** Deterministic PATTERNED single-frame GIF: 9×8 grayscale with
    * pixel(x,y) = (seed·31 + x·13 + y·7 + off) mod 256 — spatial
    * structure (unlike [[gifSynth]]'s uniform frames) so PERCEPTUAL
    * hashes are non-degenerate, still fully closed-form so the oracle
    * can regenerate every pixel. GIF is palette-lossless, so the decode
    * recovers these values bit-exactly. */
  def gifPatternSynth(seed: Long, off: Long, w: Int = 9, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (((seed * 31 + x * 13 + y * 7 + off) % 256 + 256) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** Patterned-GIF payload per id: base pattern seed = id mod 7 (ids
    * sharing a base are perceptual near-dups), brightness offset =
    * id div 100 (a uniform shift flips a dHash bit only where the mod-256
    * wrap crosses an adjacent-pixel pair — a small, closed-form hamming
    * perturbation). */
  def gifPatternFromIds(ids: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(gifSchema)
    spreadIds(ids).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, gifPatternSynth(id % 7, id / 100))
      }
    }(enc)
  }

  /** Spread the id column across the full shuffle width BEFORE media
    * synthesis: the id source is a parquet scan whose partition count is
    * the FILE count (10 at sf1), so everything downstream — synthesis,
    * frame sampling, JPEG/PNG decode, the entire cost of the media
    * pipeline — would run at file-count parallelism on a 32-way (or
    * 1000-executor) cluster. Shuffling the LONG ids costs ~8 bytes/row;
    * shuffling after synthesis would move the media bytes instead, and
    * not shuffling at all left 3.2× idle cores at sf1 (measured:
    * q101 11.4 s, q106 14.3 s at 10-way).
    *
    * The partition count is pinned EXPLICITLY: the id shuffle is a few
    * KB, so an unpinned `repartition(col)` gets AQE-coalesced to ONE
    * partition (coalescePartitions sizes by bytes and cannot see the
    * per-row decode cost downstream) — measured at sf1, that made q101
    * 60% SLOWER than the 10-way it was meant to fix. */
  private def spreadIds(ids: DataFrame): DataFrame =
    ids.select("doc_id").repartition(
      ids.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("h_hi", LongType, nullable = true),
    StructField("h_lo", LongType, nullable = true)))

  /** REAL perceptual dHash over decoded pixels: the first frame is
    * decoded through the JDK GIF reader, and bit (y·8 + x) is set iff
    * pixel(x,y) < pixel(x+1,y) — the classic difference hash, split into
    * two 32-bit halves (rows 0–3 → h_hi, rows 4–7 → h_lo) so all bit
    * arithmetic stays in signed-long-safe range in BOTH engines (a
    * single 64-bit hash would need 1<<63). Null halves when the payload
    * doesn't decode. Partition-local. */
  def decodeDHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(dhashSchema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        gifFrames(bytes).flatMap(_.headOption) match {
          case Some(img) if img.getWidth >= 9 && img.getHeight >= 8 =>
            var hi = 0L; var lo = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val p = img.getRGB(x, y) & 0xFF
                val pn = img.getRGB(x + 1, y) & 0xFF
                if (p < pn) {
                  val bit = 1L << ((y % 4) * 8 + x)
                  if (y < 4) hi |= bit else lo |= bit
                }
                x += 1
              }
              y += 1
            }
            Row(id, hi, lo)
          case _ => Row(id, null, null)
        }
      }
    }(enc)
  }

  /** Deterministic animated-GIF synthesis: `nFrames` uniform-gray frames
    * (gray_f = (seed·7 + f·40) mod 256) through the JDK's own GIF
    * sequence writer — a REAL multi-frame container whose per-frame pixel
    * values are closed-form, so frame decode is exact-value-testable. */
  def gifSynth(seed: Long, nFrames: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val g = (((seed * 7 + f * 40) % 256 + 256) % 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** REAL multi-frame decode: every frame of a GIF container via the JDK
    * reader (None for anything that is not a GIF). */
  def gifFrames(bytes: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] = {
    if (bytes == null || bytes.length < 6 ||
        !(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')) return None
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try {
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)), false, true)
      val n = reader.getNumImages(true)
      Some((0 until n).map(reader.read(_)))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally reader.dispose()
  }

  def sampleFrames(media: DataFrame, everyMs: Long = 1000L,
      maxFrames: Int = 8): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("media_id", "media_type", "content").mapPartitions { it =>
      // per-partition decoder init would go here (one ffmpeg context
      // reused across rows, torn down when the iterator drains)
      it.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
        // REAL video path: MJPEG-in-AVI frames (RIFF walk + JDK JPEG
        // decode per frame) — same re-encode contract as the GIF branch
        val gif = gifFrames(bytes).filter(_.length > 1)
          .orElse(aviFrames(bytes).filter(_.nonEmpty))
        if (gif.isDefined) {
          // REAL multi-frame path: each GIF frame is decoded and
          // re-encoded as PNG — actual pixels, not a byte slice. Cadence
          // is the sampler's `everyMs` (GIF per-frame delays live in
          // GraphicControlExtension metadata; not parsed here).
          gif.get.take(maxFrames).zipWithIndex.map { case (img, i) =>
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            Row(r.getLong(0), i, i * everyMs, bos.toByteArray)
          }
        } else if (imageMeta(bytes).isDefined)
          Seq(Row(r.getLong(0), 0, 0L, bytes)) // a still = one frame
        else {
          // FAKE duration model: 1 notional second per 256 payload bytes
          val durationMs = (bytes.length / 256 + 1) * 1000L
          val n = math.min(maxFrames, (durationMs / everyMs).toInt.max(1))
          (0 until n).map { i =>
            val ts = i * everyMs
            // FAKE frame payload: a deterministic 64-byte slice at the
            // frame's proportional offset — a real sampler decodes here
            val off = if (bytes.isEmpty) 0 else ((ts * bytes.length) / durationMs).toInt
            val end = math.min(bytes.length, off + 64)
            Row(r.getLong(0), i, ts, java.util.Arrays.copyOfRange(bytes, off, end))
          }
        }
      }
    }(enc)
  }

  // ---------------------------------------------------- video: MJPEG/AVI

  /** Uniform-gray JPEG frame bytes. A CONSTANT 8×8 block has only a DC
    * DCT coefficient, which the JDK encoder's quantization preserves —
    * verified exhaustively: all 256 gray values round-trip bit-exactly
    * through encode+decode — so closed-form frame values survive a REAL
    * lossy codec and stay oracle-checkable. */
  def jpegSynth(gray: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic MJPEG-in-AVI synthesis: a spec-correct RIFF AVI
    * container (avih/strl headers, movi chunk list, idx1 index) whose
    * `00dc` frames are real JPEGs of closed-form uniform gray
    * (gray_f = (seed·11 + f·37) mod 256). MJPEG is the one video codec
    * class the JDK can truly decode (every frame is an independent JPEG),
    * so the video leg gets the same REAL write→walk→decode treatment as
    * WAV audio ([[wavSynth]]) and animated GIF ([[gifSynth]]). */
  def aviSynth(seed: Long, nFrames: Int, w: Int = 8, h: Int = 8,
      fps: Int = 2): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      jpegSynth((((seed * 11 + f * 37) % 256 + 256) % 256).toInt, w, h)
    }
    def fourcc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >>> 24) & 0xFF).toByte)
    def le16(v: Int): Array[Byte] = Array[Byte](
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    // ---- headers (fixed sizes, so lengths are computable up front)
    val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le16(0) ++
      le16(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      fourcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val strl = fourcc("strl") ++
      fourcc("strh") ++ le32(strh.length) ++ strh ++
      fourcc("strf") ++ le32(strf.length) ++ strf
    val hdrl = fourcc("hdrl") ++
      fourcc("avih") ++ le32(avih.length) ++ avih ++
      fourcc("LIST") ++ le32(strl.length) ++ strl
    // ---- movi chunk list (frames pad to even length per RIFF)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write(fourcc("movi"))
    val offsets = frames.map { jb =>
      val off = movi.size() - 4 // offset from just after 'movi' fourcc
      movi.write(fourcc("00dc")); movi.write(le32(jb.length)); movi.write(jb)
      if ((jb.length & 1) == 1) movi.write(0)
      (off + 4, jb.length) // idx1 convention: offset of the '00dc' fourcc
    }
    val idx1 = new java.io.ByteArrayOutputStream()
    offsets.foreach { case (off, len) =>
      idx1.write(fourcc("00dc")); idx1.write(le32(0x10)) // AVIIF_KEYFRAME
      idx1.write(le32(off)); idx1.write(le32(len))
    }
    val body = new java.io.ByteArrayOutputStream()
    body.write(fourcc("AVI "))
    body.write(fourcc("LIST")); body.write(le32(hdrl.length)); body.write(hdrl.toArray)
    body.write(fourcc("LIST")); body.write(le32(movi.size())); body.write(movi.toByteArray)
    body.write(fourcc("idx1")); body.write(le32(idx1.size())); body.write(idx1.toByteArray)
    bos.write(fourcc("RIFF")); bos.write(le32(body.size())); bos.write(body.toByteArray)
    bos.toByteArray
  }

  /** REAL MJPEG-in-AVI frame decode: the same RIFF chunk walk as
    * [[wavMeta]] (top-level chunks, LIST descent, even-length padding)
    * finds the `movi` list, and every `NNdc`/`NNdb` frame chunk is a
    * complete JPEG the JDK decoder reads. None for non-AVI bytes; frame
    * chunks the decoder rejects are skipped (route, don't drop). */
  def aviFrames(bytes: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] = {
    val b = bytes
    if (b == null || b.length < 12) return None
    def tag(off: Int): String = new String(b, off, 4, "ISO-8859-1")
    def le32(off: Int): Long = (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    // all offsets advance in Long (lengths read UNSIGNED, so a corrupt
    // 0xFFFFFFF8 can never go negative, stall the walk, or overflow) and
    // chunk extents CLAMP to the buffer — a benignly-truncated download
    // still yields every complete frame before the cut, while a frame
    // chunk that extends past the clamp is skipped, never decoded
    // partially (route, don't spin/throw)
    val out = scala.collection.mutable.ArrayBuffer[java.awt.image.BufferedImage]()
    var off = 12L
    while (off + 8 <= b.length) {
      val id = tag(off.toInt)
      val len = le32(off.toInt + 4) // unsigned 32-bit, 0..2^32-1
      if (id == "LIST" && off + 12 <= b.length && tag(off.toInt + 8) == "movi") {
        var p = off + 12
        val end = math.min(off + 8 + len, b.length.toLong)
        var inner = true
        while (inner && p + 8 <= end) {
          val cid = tag(p.toInt)
          val clen = le32(p.toInt + 4)
          if (clen > end - p - 8) inner = false // truncated frame: stop here
          else {
            if (cid.endsWith("dc") || cid.endsWith("db")) {
              try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
                b, p.toInt + 8, clen.toInt))).foreach(out += _)
              catch { case scala.util.control.NonFatal(_) => () }
            }
            p += 8 + clen + (clen & 1)
          }
        }
      }
      off += 8 + len + (len & 1) // len >= 0, so the walk always advances
    }
    Some(out.toSeq)
  }

  /** Deterministic MJPEG/AVI payload per id: 2 + id%5 frames of
    * closed-form uniform gray — real container bytes in an opaque binary
    * column (the video analog of [[audioFromIds]]/[[gifFromIds]]). */
  def aviFromIds(ids: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(gifSchema)
    spreadIds(ids).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, aviSynth(id, (2 + id % 5).toInt))
      }
    }(enc)
  }

  val gifSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Deterministic animated-GIF payload per id: 2 + id%5 frames of
    * closed-form uniform gray — real container bytes in an opaque binary
    * column (the multi-frame analog of [[audioFromIds]]). */
  def gifFromIds(ids: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(gifSchema)
    spreadIds(ids).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, gifSynth(id, (2 + id % 5).toInt))
      }
    }(enc)
  }

  val gifGraySchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", LongType, nullable = false),
    StructField("gray", LongType, nullable = true)))

  /** REAL per-frame MEAN gray over [[sampleFrames]] output: each frame
    * payload (PNG re-encoded from the decoded GIF/MJPEG frame) is decoded
    * and its integer mean gray computed over EVERY pixel — a whole-frame
    * check, so any pixel corruption anywhere in the
    * container-write/frame-walk/JPEG-decode/PNG-re-encode chain shifts
    * the value. Exact for the closed-form uniform frames (sum = g·w·h).
    * Partition-local. */
  def decodeFrameMeanGray(frames: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(gifGraySchema)
    frames.select("media_id", "frame_no", "frame").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        val gray =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))).map { img =>
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
              y += 1
            }
            sum / (img.getWidth.toLong * img.getHeight)
          }
          catch { case scala.util.control.NonFatal(_) => None }
        Row(r.getLong(0), r.getInt(1).toLong, gray.orNull)
      }
    }(enc)
  }

  /** REAL per-frame pixel decode over [[sampleFrames]] output: each frame
    * payload (PNG re-encoded from the GIF frame) is decoded and its pixel
    * gray value read back — so container write, frame enumeration, AND
    * two decode hops are all on the checked path. Partition-local. */
  def decodeGifGray(frames: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(gifGraySchema)
    frames.select("media_id", "frame_no", "frame").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        val gray =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
            .map(img => (img.getRGB(0, 0) & 0xFF).toLong)
          catch { case scala.util.control.NonFatal(_) => None }
        Row(r.getLong(0), r.getInt(1).toLong, gray.orNull)
      }
    }(enc)
  }

  // --------------------------------------------------------------- audio

  /** Real RIFF/WAVE metadata: walks the chunk list (fmt / data, skipping
    * unknown chunks with odd-length padding per the RIFF spec) and returns
    * (audioFormat, channels, sampleRate, bitsPerSample, nSamples), or None
    * when the bytes are not a WAV file. Pure JVM — the JDK needs no codec
    * to parse PCM containers, so unlike video this path is NOT a fake. */
  def wavMeta(b: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
    def le16(off: Int): Int = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    def le32(off: Int): Long = (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    def tag(off: Int): String = new String(b, off, 4, "ISO-8859-1")
    if (b == null || b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // format, ch, rate, block, bits
    var dataLen = -1L
    while (off + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(off)
      val len = le32(off + 4)
      if (id == "fmt " && off + 8 + 16 <= b.length)
        fmt = Some((le16(off + 8), le16(off + 10), le32(off + 12).toInt,
          le16(off + 20), le16(off + 22)))
      else if (id == "data")
        dataLen = math.min(len, (b.length - off - 8).toLong)
      off += 8 + len.toInt + (len.toInt & 1) // chunks pad to even length
    }
    for ((f, ch, rate, block, bits) <- fmt if dataLen >= 0 && block > 0)
      yield (f, ch, rate, bits, dataLen / block)
  }

  /** Real PCM16 sample statistics from WAV bytes: (peak = max |sample|,
    * sumSq = Σ sample²) over the data chunk — exact integer outputs, so a
    * SQL oracle that regenerates the same samples must agree. None for
    * non-WAV or non-16-bit payloads. */
  def wavStats(b: Array[Byte]): Option[(Long, Long)] = wavMeta(b).flatMap {
    case (fmtCode, _, _, bits, _) if fmtCode != 1 || bits != 16 => None
    case (_, _, _, _, nSamples) =>
      // find the data chunk again (cheap — headers are tiny)
      def le32(off: Int): Long = (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
      def tag(off: Int): String = new String(b, off, 4, "ISO-8859-1")
      var off = 12
      var dataOff = -1
      while (off + 8 <= b.length && dataOff < 0) {
        if (tag(off) == "data") dataOff = off + 8
        else off += 8 + le32(off + 4).toInt + (le32(off + 4).toInt & 1)
      }
      if (dataOff < 0) None
      else {
        var peak = 0L
        var sumSq = 0L
        var i = 0
        while (i < nSamples) {
          val v = ((b(dataOff + 2 * i) & 0xFF) |
            (b(dataOff + 2 * i + 1) << 8)).toShort.toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          sumSq += v * v
          i += 1
        }
        Some((peak, sumSq))
      }
  }

  /** Deterministic PCM16 mono WAV synthesis from a seed — the test-data
    * half of the REAL audio path: sample k is the closed-form hash
    * `((seed·2654435761 + k·40503) & 0xFFFF) − 32768` (no recurrence, no
    * trig — a SQL oracle regenerates it row-for-row), wrapped in a
    * spec-correct RIFF container that [[wavMeta]]/[[wavStats]] then parse
    * back like any foreign WAV. */
  def wavSynth(seed: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("ISO-8859-1")).putInt(dataLen)
    var k = 0
    while (k < nSamples) {
      val v = (((seed * 2654435761L + k * 40503L) & 0xFFFFL) - 32768L).toShort
      buf.putShort(v)
      k += 1
    }
    buf.array()
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Deterministic WAV payload per document id (duration and sample rate
    * vary by id) — the audio analog of [[mediaFromDocuments]]: real RIFF
    * bytes in an opaque binary column. Partition-local, no shuffle. */
  def audioFromIds(ids: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioSchema)
    spreadIds(ids).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, wavSynth(id, (1000L + (id % 200L) * 10L).toInt,
          (8000L + (id % 3L) * 4000L).toInt))
      }
    }(enc)
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("peak", LongType, nullable = true),
    StructField("sum_sq", LongType, nullable = true)))

  /** Partition-local REAL audio decode: [[wavMeta]] parses the RIFF
    * container, [[wavStats]] reads every PCM16 sample — format, rate,
    * duration, peak, and energy are computed from the BYTES, not assumed
    * from the generator (non-WAV payloads yield nulls: route, don't
    * drop). Integer outputs end-to-end so the whole path — container
    * write, chunk walk, little-endian sample decode — is hash-checkable
    * against a SQL oracle. */
  def decodeAudio(audio: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioMetaSchema)
    audio.select("doc_id", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1) // positional: schemaless Rows after mapPartitions
        (wavMeta(bytes), wavStats(bytes)) match {
          case (Some((_, _, rate, _, n)), Some((peak, sumSq))) =>
            Row(id, rate.toLong, n, n * 1000L / rate, peak, sumSq)
          case _ => Row(id, null, null, null, null, null)
        }
      }
    }(enc)
  }

  val warcBlobSchema: StructType = StructType(Seq(
    StructField("blob_id", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Deterministic WARC/1.0 fixture — one `response` record per doc,
    * records concatenated per source in doc_id order (the Common Crawl
    * member layout: many records per .warc file). Drives q248 the q89
    * way: the bytes are REALLY written here and REALLY parsed by
    * [[parseWarc]], and the oracle regenerates every field from the
    * source rows — container writer AND parser are hash-gated.
    *
    * Scale: one shuffle to group docs per blob; per-blob memory is the
    * member size (the real format is designed for ~1 GB members — at
    * that size split sources into numbered members upstream). */
  def warcFromDocs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(warcBlobSchema)
    docs.select(col("source"), col("doc_id"), col("text"))
      .groupBy(col("source"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
        .as("__ds"))
      .mapPartitions { it =>
        it.map { r =>
          val src = r.getString(0)
          val bos = new java.io.ByteArrayOutputStream()
          r.getSeq[Row](1).foreach { d =>
            val id = d.getLong(0)
            val payload = d.getString(1)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val hdr = s"WARC/1.0\r\nWARC-Type: response\r\n" +
              s"WARC-Target-URI: http://example.com/docs/$id\r\n" +
              "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
              "Content-Type: text/plain\r\n" +
              s"Content-Length: ${payload.length}\r\n\r\n"
            bos.write(hdr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            bos.write(payload)
            bos.write(Array[Byte]('\r', '\n', '\r', '\n'))
          }
          Row(src, bos.toByteArray)
        }
      }(enc)
  }

  val warcRecordSchema: StructType = StructType(Seq(
    StructField("blob_id", StringType, nullable = false),
    StructField("rec_no", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload_head", StringType, nullable = true)))

  /** Minimal WARC/1.0 record walk: version line, `Header: value` block
    * to the blank line, Content-Length payload framing, two CRLFs
    * between records. Malformed/truncated tails stop the walk for that
    * blob (records parsed so far are kept) — ingest robustness over
    * hard failure, the right default for crawl data. Partition-local,
    * no shuffle; payload_head carries the first 32 payload chars so the
    * round-trip gate checks real payload bytes, not just headers. */
  def parseWarc(blobs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(warcRecordSchema)
    blobs.select(col("blob_id"), col("content")).mapPartitions { it =>
      // Charset is not Serializable — resolve inside the task
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      it.flatMap { r =>
        val id = r.getString(0)
        val b = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        def findBlank(from: Int): Int = {
          var i = from
          while (i + 3 < b.length) {
            if (b(i) == '\r' && b(i + 1) == '\n' &&
              b(i + 2) == '\r' && b(i + 3) == '\n') return i
            i += 1
          }
          -1
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var pos = 0
        var rec = 1L
        var halt = false
        while (!halt && pos < b.length) {
          val hEnd = findBlank(pos)
          if (hEnd < 0) halt = true
          else {
            val lines = new String(b, pos, hEnd - pos, utf8).split("\r\n")
            if (!lines.headOption.exists(_.startsWith("WARC/"))) halt = true
            else {
              val kv = lines.tail.flatMap { l =>
                val i = l.indexOf(':')
                if (i < 0) None
                else Some(l.substring(0, i).trim.toLowerCase ->
                  l.substring(i + 1).trim)
              }.toMap
              kv.get("content-length")
                .flatMap(s => scala.util.Try(s.toLong).toOption) match {
                case Some(n) if n >= 0 && hEnd + 4 + n <= b.length =>
                  val pStart = hEnd + 4
                  // Decode the FULL payload, then take the first 32
                  // CHARACTERS (codepoints — the unit both Spark's
                  // substring and DuckDB's substr count), never the
                  // first 32 bytes: a byte prefix of non-ASCII text
                  // would split a codepoint mid-sequence into U+FFFD
                  // and diverge from the substr(text,1,32) oracle.
                  val payload = new String(b, pStart, n.toInt, utf8)
                  val head = payload.substring(0, payload.offsetByCodePoints(
                    0, math.min(32, payload.codePointCount(0, payload.length))))
                  out += Row(id, rec, kv.getOrElse("warc-type", null),
                    kv.getOrElse("warc-target-uri", null), n, head)
                  rec += 1
                  pos = pStart + n.toInt
                  if (pos + 4 <= b.length && b(pos) == '\r' &&
                    b(pos + 1) == '\n' && b(pos + 2) == '\r' &&
                    b(pos + 3) == '\n') pos += 4
                case _ => halt = true // missing/invalid/truncated framing
              }
            }
          }
        }
        out.iterator
      }
    }(enc)
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
        val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
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
