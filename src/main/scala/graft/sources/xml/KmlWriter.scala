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

/** KML write path (any-driver W1/W3 parity; the reader's inverse): each
  * partition emits a `part-NNNNN.kml` Document of Placemarks. A `name`
  * column becomes the Placemark <name>; every other property rides in
  * ExtendedData (KML's untyped Data/value pairs — numeric/bool/date
  * values round-trip as their canonical strings, which is what GDAL's
  * KML driver produces too). Geometry covers Point/LineString/Polygon
  * (outer+inner rings) and multi/collection types via MultiGeometry. */
object KmlSerializer {

  def xml(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def coords(cs: Array[Coordinate]): String =
    cs.map(c => s"${c.x},${c.y}").mkString(" ")

  def geometry(g: org.locationtech.jts.geom.Geometry, out: Writer): Unit = g match {
    case p: Point =>
      out.write(s"<Point><coordinates>${p.getX},${p.getY}</coordinates></Point>")
    case l: LineString =>
      out.write(s"<LineString><coordinates>${coords(l.getCoordinates)}</coordinates></LineString>")
    case p: Polygon =>
      out.write("<Polygon><outerBoundaryIs><LinearRing><coordinates>")
      out.write(coords(p.getExteriorRing.getCoordinates))
      out.write("</coordinates></LinearRing></outerBoundaryIs>")
      (0 until p.getNumInteriorRing).foreach { i =>
        out.write("<innerBoundaryIs><LinearRing><coordinates>")
        out.write(coords(p.getInteriorRingN(i).getCoordinates))
        out.write("</coordinates></LinearRing></innerBoundaryIs>")
      }
      out.write("</Polygon>")
    case m: GeometryCollection => // MultiPoint/Line/Polygon + collections
      out.write("<MultiGeometry>")
      (0 until m.getNumGeometries).foreach(i => geometry(m.getGeometryN(i), out))
      out.write("</MultiGeometry>")
    case other => throw new IllegalStateException(
      s"unsupported KML geometry ${other.getGeometryType}")
  }

  /** One Placemark. `name` (when present and non-null) becomes <name>;
    * other non-null properties become ExtendedData Data/value pairs
    * (null props skipped, reference src/lib.rs:562-567). */
  def writeFeature(row: InternalRow, schema: StructType, geomIdx: Int,
      opts: GdalOptions, out: Writer): Unit = {
    out.write("<Placemark>")
    val nameIdx = schema.fieldNames.indexOf("name")
    if (nameIdx >= 0 && nameIdx != geomIdx && !row.isNullAt(nameIdx))
      out.write(s"<name>${xml(valueString(row, nameIdx, schema.fields(nameIdx).dataType))}</name>")
    val dataIdx = schema.fields.indices
      .filter(i => i != geomIdx && i != nameIdx && !row.isNullAt(i))
      .filterNot(i => schema.fields(i).dataType == BinaryType)
    if (dataIdx.nonEmpty) {
      out.write("<ExtendedData>")
      dataIdx.foreach { i =>
        out.write(s"""<Data name="${xml(schema.fields(i).name)}"><value>""")
        out.write(xml(valueString(row, i, schema.fields(i).dataType)))
        out.write("</value></Data>")
      }
      out.write("</ExtendedData>")
    }
    if (!row.isNullAt(geomIdx)) {
      val g = schema.fields(geomIdx).dataType match {
        case BinaryType => GeomCodec.fromWkb(row.getBinary(geomIdx))
        case _ => GeomCodec.fromWkt(row.getUTF8String(geomIdx).toString)
      }
      geometry(g, out)
    }
    out.write("</Placemark>\n")
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

class KmlWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val path = Option(info.options.get("path"))
        .getOrElse(throw new IllegalArgumentException("kml write requires a path"))
      new KmlBatchWrite(path, info.schema(), GdalOptions(info.options), doTruncate)
    }
  }
}

case class KmlCommit(rows: Long, committedPaths: Seq[String] = Nil)
  extends WriterCommitMessage with graft.sources.CommittedFiles

class KmlBatchWrite(path: String, schema: StructType, opts: GdalOptions,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    if (!dir.exists()) dir.mkdirs()
    if (truncate) dir.listFiles().filter(_.getName.endsWith(".kml")).foreach(_.delete())
    if (truncate) graft.sources.AttemptFile.cleanDebris(dir)
    val gi = schema.fieldNames.indexOf(opts.geometryColumnName)
    if (gi < 0) throw new GraftError.CannotFindGeometryColumn(opts.geometryColumnName)
    schema.fields(gi).dataType match {
      case BinaryType | StringType => ()
      case _ => throw new GraftError.GeometryColumnWrongType(opts.geometryColumnName)
    }
    new KmlWriterFactory(path, graft.sources.LayerWrite.stem(dir, opts, truncate), schema, opts)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    graft.sources.AttemptFile.verifyCommitted(messages)
    if (messages.map { case KmlCommit(n, _) => n }.sum == 0L)
      throw new GraftError.EmptyDataframe
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class KmlWriterFactory(path: String, stem: String, schema: StructType, opts: GdalOptions)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KmlDataWriter(new File(path, f"$stem%s-$partitionId%05d.kml"), schema, opts, taskId)
}

class KmlDataWriter(file: File, schema: StructType, opts: GdalOptions,
    taskId: Long)
  extends DataWriter[InternalRow] {
  private val geomIdx = schema.fieldNames.indexOf(opts.geometryColumnName)
  private val tmp = graft.sources.AttemptFile.temp(file, taskId)
  private val out = new BufferedWriter(
    new OutputStreamWriter(new FileOutputStream(tmp), StandardCharsets.UTF_8))
  private var n = 0L
  out.write("""<?xml version="1.0" encoding="UTF-8"?>""")
  out.write("\n<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document>\n")

  override def write(row: InternalRow): Unit = {
    KmlSerializer.writeFeature(row, schema, geomIdx, opts, out)
    n += 1
  }
  override def commit(): WriterCommitMessage = {
    out.write("</Document></kml>\n")
    out.close()
    graft.sources.AttemptFile.promote(tmp, file)
    KmlCommit(n, Seq(file.getAbsolutePath))
  }
  override def abort(): Unit = { out.close(); tmp.delete(); () }
  override def close(): Unit = ()
}
