package graft.sources.flatgeobuf

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}

import graft.geom.GeomCodec
import graft.sources._

/** FlatGeobuf DSv2 source: magic → size-prefixed Header → (skipped)
  * packed R-tree index → streamed size-prefixed Features. Spatial-index
  * queries are intentionally not used — Spark scans are full-table with
  * filter pushdown, and the index region is just skipped (its size is
  * computable from the header, FgbCodec.indexSize). */
class FgbFormat extends FeatureFormat {
  override def extensions: Seq[String] = Seq(".fgb")

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

    var fid = -1L
    val it = new Iterator[RawFeature] {
      private var nextF: RawFeature = advance()

      private def advance(): RawFeature = {
        val bytes = try readPrefixed(in) catch { case _: EOFException => null }
        if (bytes == null) null
        else {
          fid += 1
          val t = FgbCodec.rootTable(bytes)
          val geomPos = t.indirect(0)
          val wkb =
            if (geomPos < 0) null
            else GeomCodec.toWkb(FgbCodec.readGeometry(
              new FgbCodec.FbTab(t.bb, geomPos), header.geometryType))
          val props = t.vector(1) match {
            case null => IndexedSeq.empty[(String, Any)]
            case (start, len) =>
              val vals = FgbCodec.unpackProperties(header.columns, bytes, start, len)
              header.columns.indices.map(i => header.columns(i).name -> vals(i)).toIndexedSeq
          }
          RawFeature(fid, wkb, props)
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

  /** Read a size-prefixed flatbuffer (uint32 LE length + body); null at
    * clean EOF. */
  private def readPrefixed(in: DataInputStream): Array[Byte] = {
    val b0 = in.read()
    if (b0 < 0) throw new EOFException()
    val len = b0 | (in.read() << 8) | (in.read() << 16) | (in.read() << 24)
    // the prefix counts the body only; internal offsets are relative to
    // the body start, so returning the bare body keeps them valid
    val body = new Array[Byte](len)
    in.readFully(body)
    body
  }
}

class FgbSourceProvider extends FeatureSourceProvider {
  override def shortName(): String = "flatgeobuf"
  override def format: FeatureFormat = new FgbFormat

  override def getTable(schema: org.apache.spark.sql.types.StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): org.apache.spark.sql.connector.catalog.Table = {
    val opts = GdalOptions.from(scala.jdk.CollectionConverters.MapHasAsScala(properties).asScala.toMap)
    val paths = Option(properties.get("path")).toSeq
    val files =
      if (paths.nonEmpty && new java.io.File(paths.head).exists())
        FeatureFormat.expand(paths, format)
      else paths
    new FgbTable(schema, files, opts, format)
  }
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
