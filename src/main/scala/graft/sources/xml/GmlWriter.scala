package graft.sources.xml

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter, Writer}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom._

import graft.geom.GeomCodec
import graft.sources.{GdalOptions, GraftError}

/** GML write path (the [[GmlFormat]] reader's inverse, completing the
  * read/write matrix for the WFS/INSPIRE interchange format): each
  * partition emits a `part-NNNNN.gml` FeatureCollection of
  * featureMembers. The feature element name is `layerName` (default
  * `feature`); a `gml_id` column (when present) becomes the gml:id
  * attribute, every other non-binary property a child element, and
  * geometry writes GML3 forms — Point/pos, LineString/posList,
  * Polygon/exterior+interior, Multi* with member wrappers — exactly the
  * subset the reader parses back. */
object GmlSerializer {

  private def coordsList(cs: Array[Coordinate]): String =
    cs.map(c => s"${c.x} ${c.y}").mkString(" ")

  def geometry(g: org.locationtech.jts.geom.Geometry, out: Writer): Unit = g match {
    case p: Point =>
      out.write(s"<gml:Point><gml:pos>${p.getX} ${p.getY}</gml:pos></gml:Point>")
    case l: LineString =>
      out.write(s"<gml:LineString><gml:posList>${coordsList(l.getCoordinates)}</gml:posList></gml:LineString>")
    case p: Polygon =>
      out.write("<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>")
      out.write(coordsList(p.getExteriorRing.getCoordinates))
      out.write("</gml:posList></gml:LinearRing></gml:exterior>")
      (0 until p.getNumInteriorRing).foreach { i =>
        out.write("<gml:interior><gml:LinearRing><gml:posList>")
        out.write(coordsList(p.getInteriorRingN(i).getCoordinates))
        out.write("</gml:posList></gml:LinearRing></gml:interior>")
      }
      out.write("</gml:Polygon>")
    case m: MultiPoint =>
      out.write("<gml:MultiPoint>")
      (0 until m.getNumGeometries).foreach { i =>
        out.write("<gml:pointMember>"); geometry(m.getGeometryN(i), out)
        out.write("</gml:pointMember>")
      }
      out.write("</gml:MultiPoint>")
    case m: MultiLineString =>
      out.write("<gml:MultiCurve>")
      (0 until m.getNumGeometries).foreach { i =>
        out.write("<gml:curveMember>"); geometry(m.getGeometryN(i), out)
        out.write("</gml:curveMember>")
      }
      out.write("</gml:MultiCurve>")
    case m: MultiPolygon =>
      out.write("<gml:MultiSurface>")
      (0 until m.getNumGeometries).foreach { i =>
        out.write("<gml:surfaceMember>"); geometry(m.getGeometryN(i), out)
        out.write("</gml:surfaceMember>")
      }
      out.write("</gml:MultiSurface>")
    case m: GeometryCollection =>
      out.write("<gml:MultiGeometry>")
      (0 until m.getNumGeometries).foreach { i =>
        out.write("<gml:geometryMember>"); geometry(m.getGeometryN(i), out)
        out.write("</gml:geometryMember>")
      }
      out.write("</gml:MultiGeometry>")
    case other => throw new IllegalStateException(
      s"unsupported GML geometry ${other.getGeometryType}")
  }

  /** One featureMember. `gml_id` (when present and non-null) becomes the
    * gml:id attribute; other non-null, non-binary properties become
    * child elements (nulls skipped — the reader's ragged contract). */
  def writeFeature(row: InternalRow, schema: StructType, geomIdx: Int,
      typeName: String, fallbackId: String, out: Writer): Unit = {
    val idIdx = schema.fieldNames.indexOf("gml_id")
    val id =
      if (idIdx >= 0 && idIdx != geomIdx && !row.isNullAt(idIdx))
        valueString(row, idIdx, schema.fields(idIdx).dataType)
      else fallbackId
    out.write(s"""<gml:featureMember><app:$typeName gml:id="${KmlSerializer.xml(id)}">""")
    schema.fields.indices
      .filter(i => i != geomIdx && i != idIdx && !row.isNullAt(i))
      .filterNot(i => schema.fields(i).dataType == BinaryType)
      .foreach { i =>
        val n = schema.fields(i).name
        out.write(s"<app:${n}>")
        out.write(KmlSerializer.xml(valueString(row, i, schema.fields(i).dataType)))
        out.write(s"</app:${n}>")
      }
    if (!row.isNullAt(geomIdx)) {
      val g = schema.fields(geomIdx).dataType match {
        case BinaryType => GeomCodec.fromWkb(row.getBinary(geomIdx))
        case _ => GeomCodec.fromWkt(row.getUTF8String(geomIdx).toString)
      }
      out.write("<app:geom>")
      geometry(g, out)
      out.write("</app:geom>")
    }
    out.write(s"</app:$typeName></gml:featureMember>\n")
  }

  private def valueString(row: InternalRow, i: Int, dt: DataType): String = dt match {
    case StringType => row.getUTF8String(i).toString
    case IntegerType => row.getInt(i).toString
    case LongType => row.getLong(i).toString
    case DoubleType => row.getDouble(i).toString
    case FloatType => row.getFloat(i).toString
    case BooleanType => row.getBoolean(i).toString
    case DateType => DateTimeUtils.toJavaDate(row.getInt(i)).toString
    case TimestampType => DateTimeUtils.toJavaTimestamp(row.getLong(i)).toInstant.toString
    case other => row.get(i, other).toString
  }
}

class GmlWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val path = Option(info.options.get("path"))
        .getOrElse(throw new IllegalArgumentException("gml write requires a path"))
      new GmlBatchWrite(path, info.schema(), GdalOptions(info.options), doTruncate)
    }
  }
}

case class GmlCommit(rows: Long, committedPaths: Seq[String] = Nil)
  extends WriterCommitMessage with graft.sources.CommittedFiles

class GmlBatchWrite(path: String, schema: StructType, opts: GdalOptions,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    if (!dir.exists()) dir.mkdirs()
    if (truncate) dir.listFiles().filter(_.getName.endsWith(".gml")).foreach(_.delete())
    if (truncate) graft.sources.AttemptFile.cleanDebris(dir)
    val gi = schema.fieldNames.indexOf(opts.geometryColumnName)
    if (gi < 0) throw new GraftError.CannotFindGeometryColumn(opts.geometryColumnName)
    schema.fields(gi).dataType match {
      case BinaryType | StringType => ()
      case _ => throw new GraftError.GeometryColumnWrongType(opts.geometryColumnName)
    }
    // every column emitted as an element name must be a valid XML NCName
    // (no colons/spaces/leading digits) or the produced document is
    // malformed and GmlFormat cannot read it back — fail fast at plan
    // time, mirroring the geometry-column checks above
    val ncName = "^[\\p{L}_][\\p{L}\\p{N}._\\-]*$".r
    val elementCols = schema.fields.zipWithIndex.collect {
      case (f, i) if i != gi && f.name != "gml_id" && f.dataType != BinaryType => f.name
    }
    val bad = (elementCols :+ opts.layerName.getOrElse("feature"))
      .filterNot(n => ncName.matches(n))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"gml write: column/layer names must be XML NCNames (letter/_ start, no colons or spaces): ${bad.mkString(", ")}")
    new GmlWriterFactory(path, graft.sources.LayerWrite.stem(dir, opts, truncate),
      schema, opts)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    graft.sources.AttemptFile.verifyCommitted(messages)
    if (messages.map { case GmlCommit(n, _) => n }.sum == 0L)
      throw new GraftError.EmptyDataframe
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GmlWriterFactory(path: String, stem: String, schema: StructType, opts: GdalOptions)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GmlDataWriter(new File(path, f"$stem%s-$partitionId%05d.gml"), schema, opts,
      partitionId, taskId)
}

/** Task-attempt isolated: each attempt streams into its own
  * `<final>.t<taskId>.inprogress` sibling (an extension the reader's
  * discovery never matches), promoted to the final name only in
  * commit() — a speculative duplicate or failed attempt can neither
  * interleave bytes with the winner nor leave a truncated .gml a later
  * read would parse. */
class GmlDataWriter(file: File, schema: StructType, opts: GdalOptions, pid: Int,
    taskId: Long) extends DataWriter[InternalRow] {
  private val geomIdx = schema.fieldNames.indexOf(opts.geometryColumnName)
  private val typeName = opts.layerName.getOrElse("feature")
  private val tmp = graft.sources.AttemptFile.temp(file, taskId)
  private val out = new BufferedWriter(
    new OutputStreamWriter(new FileOutputStream(tmp), StandardCharsets.UTF_8))
  private var n = 0L
  out.write("""<?xml version="1.0" encoding="UTF-8"?>""")
  out.write("\n<gml:FeatureCollection xmlns:gml=\"http://www.opengis.net/gml\" xmlns:app=\"http://graft.example/app\">\n")

  override def write(row: InternalRow): Unit = {
    GmlSerializer.writeFeature(row, schema, geomIdx, typeName, s"f$pid-$n", out)
    n += 1
  }
  override def commit(): WriterCommitMessage = {
    out.write("</gml:FeatureCollection>\n")
    out.close()
    graft.sources.AttemptFile.promote(tmp, file)
    GmlCommit(n, Seq(file.getAbsolutePath))
  }
  override def abort(): Unit = { out.close(); tmp.delete(); () }
  override def close(): Unit = ()
}
