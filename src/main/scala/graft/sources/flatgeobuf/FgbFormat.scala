package graft.sources.flatgeobuf

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import graft.geom.GeomCodec
import graft.sources._

/** FlatGeobuf DSv2 source: magic → size-prefixed Header → packed R-tree
  * index → streamed size-prefixed Features.
  *
  * A `bbox` read option turns the packed Hilbert R-tree into split
  * pruning: the driver searches the index (touching only its pages, not
  * the features) and plans one byte-range split per contiguous candidate
  * run, so executors seek straight to matching features — the scan never
  * reads non-matching regions. Files without an index (or windowed reads,
  * which must see the whole stream) fall back to a streaming
  * envelope-intersects filter. FIDs always remain the feature's position
  * in the file, matching GDAL's spatial-filter semantics. */
class FgbFormat extends FeatureFormat {
  override def extensions: Seq[String] = Seq(".fgb")
  override def handlesBbox: Boolean = true // index splits or streamed envelope test

  /** (header, absolute byte offset of the features section). */
  private def headerInfo(path: String): (FgbCodec.FgbHeader, Long) = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    try {
      val magic = new Array[Byte](8)
      in.readFully(magic)
      require(magic.take(3).sameElements(FgbCodec.Magic.take(3)),
        s"$path is not a FlatGeobuf file")
      val headerBytes = readPrefixed(in)
      val header = FgbCodec.readHeader(headerBytes)
      val featuresStart = 8L + 4L + headerBytes.length +
        FgbCodec.indexSize(header.featuresCount, header.indexNodeSize)
      (header, featuresStart)
    } finally in.close()
  }

  /** Bbox split planning: search the packed R-tree on the driver, one
    * split per contiguous candidate run (Hilbert clustering keeps runs
    * few). No index → defer to the streaming filter in [[open]]. */
  override def planSplits(path: String, opts: GdalOptions): Seq[SplitSpec] =
    opts.bbox match {
      case Some(q) =>
        val (header, featuresStart) = headerInfo(path)
        if (header.envelope.exists(e => !q.intersects(e)))
          Seq.empty // file-level extent miss: nothing to scan
        else if (header.indexNodeSize == 0 || header.featuresCount == 0)
          Seq(SplitSpec(path, 0L, -1L))
        else {
          val indexStart = featuresStart -
            FgbCodec.indexSize(header.featuresCount, header.indexNodeSize)
          val raf = new RandomAccessFile(path, "r")
          try {
            val readNodes = (first: Long, count: Int) => {
              val buf = new Array[Byte](count * FgbIndex.NodeBytes)
              raf.seek(indexStart + first * FgbIndex.NodeBytes)
              raf.readFully(buf)
              ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            }
            FgbIndex.runs(FgbIndex.search(readNodes, header.featuresCount,
                header.indexNodeSize, q))
              .map { case (firstIdx, count, off) =>
                SplitSpec(path, firstIdx, count, byteStart = featuresStart + off)
              }
          } finally raf.close()
        }
      case None => Seq(SplitSpec(path, 0L, -1L))
    }

  override def openSplit(spec: SplitSpec, opts: GdalOptions): FeatureIterator =
    if (spec.startRecord == 0L && spec.numRecords == -1L) open(spec.path, opts)
    else {
      // index-planned byte-range run: candidates are exact envelope hits,
      // no re-filtering needed
      val (header, _) = headerInfo(spec.path)
      val in = new DataInputStream(new BufferedInputStream(
        new FileInputStream(spec.path), 1 << 16))
      var toSkip = spec.byteStart
      while (toSkip > 0) toSkip -= in.skip(toSkip)
      featureIterator(in, header, firstFid = spec.startRecord,
        maxCount = spec.numRecords, bbox = None)
    }

  override def open(path: String, opts: GdalOptions): FeatureIterator = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path), 1 << 16))
    val magic = new Array[Byte](8)
    in.readFully(magic)
    require(magic.take(3).sameElements(FgbCodec.Magic.take(3)),
      s"$path is not a FlatGeobuf file")
    val header = FgbCodec.readHeader(readPrefixed(in))
    // skip the index region if present
    val idx = FgbCodec.indexSize(header.featuresCount, header.indexNodeSize)
    var toSkip = idx
    while (toSkip > 0) toSkip -= in.skip(toSkip)
    featureIterator(in, header, firstFid = 0L, maxCount = -1L, bbox = opts.bbox)
  }

  /** Decode size-prefixed features from the current stream position.
    * `bbox` applies GDAL spatial-filter semantics: non-intersecting (and
    * geometry-less) features are skipped but still advance the FID. */
  private def featureIterator(in: DataInputStream, header: FgbCodec.FgbHeader,
      firstFid: Long, maxCount: Long, bbox: Option[FgbIndex.Box]): FeatureIterator = {
    var fid = firstFid - 1
    var remaining = maxCount
    val it = new Iterator[RawFeature] {
      private var nextF: RawFeature = advance()

      @annotation.tailrec
      private def advance(): RawFeature = {
        if (remaining == 0) return null
        val bytes = try readPrefixed(in) catch { case _: EOFException => null }
        if (bytes == null) null
        else {
          fid += 1
          if (remaining > 0) remaining -= 1
          val t = FgbCodec.rootTable(bytes)
          val geomPos = t.indirect(0)
          val geom =
            if (geomPos < 0) null
            else FgbCodec.readGeometry(new FgbCodec.FbTab(t.bb, geomPos), header.geometryType)
          val keep = bbox match {
            case None => true
            case Some(q) =>
              geom != null && !geom.isEmpty && {
                val e = geom.getEnvelopeInternal
                q.intersects(FgbIndex.Box(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))
              }
          }
          if (!keep) advance()
          else {
            val props = t.vector(1) match {
              case null => IndexedSeq.empty[(String, Any)]
              case (start, len) =>
                val vals = FgbCodec.unpackProperties(header.columns, bytes, start, len)
                header.columns.indices.map(i => header.columns(i).name -> vals(i)).toIndexedSeq
            }
            RawFeature(fid, if (geom == null) null else GeomCodec.toWkb(geom), props)
          }
        }
      }

      override def hasNext: Boolean = nextF != null
      override def next(): RawFeature = {
        val f = nextF
        nextF = advance()
        f
      }
    }
    FeatureIterator(it, () => in.close())
  }

  /** Read a size-prefixed flatbuffer (uint32 LE length + body); EOF at a
    * record boundary is clean, EOF mid-prefix or mid-body is corruption. */
  private def readPrefixed(in: DataInputStream): Array[Byte] = {
    val prefix = new Array[Byte](4)
    val first = in.read()
    if (first < 0) throw new EOFException()
    prefix(0) = first.toByte
    in.readFully(prefix, 1, 3) // EOFException here = truncated mid-prefix
    val len = ByteBuffer.wrap(prefix).order(ByteOrder.LITTLE_ENDIAN).getInt
    if (len < 0) throw new java.io.IOException(s"corrupt FlatGeobuf size prefix: $len")
    // the prefix counts the body only; internal offsets are relative to
    // the body start, so returning the bare body keeps them valid
    val body = new Array[Byte](len)
    in.readFully(body)
    body
  }
}

class FgbSourceProvider extends WritableFeatureSourceProvider {
  override def shortName(): String = "flatgeobuf"
  override def format: FeatureFormat = new FgbFormat
  protected override def newTable(schema: org.apache.spark.sql.types.StructType,
      files: Seq[String], opts: GdalOptions): org.apache.spark.sql.connector.catalog.Table =
    new FgbTable(schema, files, opts, format)
}

class FgbTable(schema: org.apache.spark.sql.types.StructType, files: Seq[String],
    opts: GdalOptions, format: FeatureFormat)
  extends FeatureTable("flatgeobuf", schema, files, opts, format)
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.catalog.TableCapability
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    : org.apache.spark.sql.connector.write.WriteBuilder = new FgbWriteBuilder(info)
}
