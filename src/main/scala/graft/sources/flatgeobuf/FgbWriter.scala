package graft.sources.flatgeobuf

import java.io.{BufferedOutputStream, File, FileOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.geom.GeomCodec
import graft.sources.{GdalOptions, GraftError}

/** FlatGeobuf write path: per-partition `part-NNNNN.fgb` (magic +
  * size-prefixed header + packed Hilbert R-tree + size-prefixed features
  * in Hilbert order, so bbox reads skip non-matching ranges). Files with
  * geometry-less features fall back to index_node_size = 0 (no index).
  * Property columns: Int/Long/Double/Boolean/String; other types go
  * through their string form. */
class FgbWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val path = Option(info.options.get("path"))
        .getOrElse(throw new IllegalArgumentException("flatgeobuf write requires a path"))
      new FgbBatchWrite(path, info.schema(), GdalOptions(info.options), doTruncate)
    }
  }
}

case class FgbCommit(rows: Long, committedPaths: Seq[String] = Nil)
  extends WriterCommitMessage with graft.sources.CommittedFiles

class FgbBatchWrite(path: String, schema: StructType, opts: GdalOptions,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    if (!dir.exists()) dir.mkdirs()
    if (truncate) dir.listFiles().filter(_.getName.endsWith(".fgb")).foreach(_.delete())
    if (truncate) graft.sources.AttemptFile.cleanDebris(dir)
    val gi = schema.fieldNames.indexOf(opts.geometryColumnName)
    if (gi < 0) throw new GraftError.CannotFindGeometryColumn(opts.geometryColumnName)
    schema.fields(gi).dataType match {
      case BinaryType | StringType => ()
      case _ => throw new GraftError.GeometryColumnWrongType(opts.geometryColumnName)
    }
    new FgbWriterFactory(path, graft.sources.LayerWrite.stem(dir, opts, truncate), schema, opts)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    graft.sources.AttemptFile.verifyCommitted(messages)
    if (messages.map { case FgbCommit(n, _) => n }.sum == 0L)
      throw new GraftError.EmptyDataframe
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class FgbWriterFactory(path: String, stem: String, schema: StructType, opts: GdalOptions)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FgbDataWriter(new File(path, f"$stem%s-$partitionId%05d.fgb"), schema, opts, taskId)
}

class FgbDataWriter(file: File, schema: StructType, opts: GdalOptions,
    taskId: Long)
  extends DataWriter[InternalRow] {
  private val tmp = graft.sources.AttemptFile.temp(file, taskId)
  import FgbCodec._

  private val FgbIndexNodeSize = 16 // spec default

  private val geomIdx = schema.fieldNames.indexOf(opts.geometryColumnName)
  private val propFields = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
  private val columns = propFields.map { case (f, _) =>
    FgbColumn(f.name, f.dataType match {
      case IntegerType => CtInt
      case LongType => CtLong
      case DoubleType | FloatType => CtDouble
      case BooleanType => CtBool
      case _ => CtString
    })
  }.toSeq

  // Features buffer in memory per partition file because the header
  // carries features_count (needed by readers to skip a missing index
  // deterministically) and the packed R-tree needs all bboxes up front;
  // partitions are executor-sized, not corpus-sized.
  private val features = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
  private val boxes = scala.collection.mutable.ArrayBuffer.empty[FgbIndex.Box]
  private var n = 0L
  private var allHaveGeometry = true

  override def write(row: InternalRow): Unit = {
    val geom =
      if (row.isNullAt(geomIdx)) null
      else schema.fields(geomIdx).dataType match {
        case BinaryType => GeomCodec.fromWkb(row.getBinary(geomIdx))
        case _ => GeomCodec.fromWkt(row.getUTF8String(geomIdx).toString)
      }
    val values = propFields.map { case (f, i) =>
      if (row.isNullAt(i)) null
      else f.dataType match {
        case IntegerType => Int.box(row.getInt(i))
        case LongType => Long.box(row.getLong(i))
        case DoubleType => Double.box(row.getDouble(i))
        case FloatType => Double.box(row.getFloat(i).toDouble)
        case BooleanType => Boolean.box(row.getBoolean(i))
        case StringType => row.getUTF8String(i).toString
        case dt => row.get(i, dt).toString
      }
    }.toSeq
    features += FgbCodec.writeFeature(geom, columns, values)
    if (geom == null || geom.isEmpty) { allHaveGeometry = false; boxes += null }
    else {
      val e = geom.getEnvelopeInternal
      boxes += FgbIndex.Box(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
    }
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    // The packed Hilbert R-tree needs a bbox per feature; a file with any
    // geometry-less feature falls back to the index-less layout
    // (index_node_size = 0), which the spec allows and every reader honors.
    val withIndex = n > 0 && allHaveGeometry
    // reference WriteParams.geometry_type (src/lib.rs:109): an explicit
    // layer type lands in the header; default stays Unknown (per-feature
    // types carry the information)
    val headerType = opts.geometryType.map {
      case "point" => GtPoint
      case "linestring" => GtLineString
      case "polygon" => GtPolygon
      case "multipoint" => GtMultiPoint
      case "multilinestring" => GtMultiLineString
      case "multipolygon" => GtMultiPolygon
      case other => throw new IllegalArgumentException(
        s"unsupported flatgeobuf geometryType '$other'")
    }.getOrElse(GtUnknown)
    val extent =
      if (withIndex) Some(boxes.reduce(_ expand _)) else None // spec field 1
    val out = new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16)
    try {
      out.write(Magic)
      out.write(writeHeader(file.getName.stripSuffix(".fgb"), headerType, columns, n,
        if (withIndex) FgbIndexNodeSize else 0, extent))
      if (withIndex) {
        // spec clustering: features stored in Hilbert order of bbox center
        val order = FgbIndex.hilbertOrder(boxes.toIndexedSeq)
        val sorted = order.map(features)
        val offsets = sorted.map(_.length.toLong).scanLeft(0L)(_ + _)
        val items = order.indices.map(i => (boxes(order(i)), offsets(i)))
        out.write(FgbIndex.build(items, FgbIndexNodeSize))
        sorted.foreach(out.write)
      } else features.foreach(out.write)
    } finally out.close()
    graft.sources.AttemptFile.promote(tmp, file)
    FgbCommit(n, Seq(file.getAbsolutePath))
  }
  override def abort(): Unit = { tmp.delete(); () }
  override def close(): Unit = ()
}
