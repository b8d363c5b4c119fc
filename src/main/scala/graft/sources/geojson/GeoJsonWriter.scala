package graft.sources.geojson

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter, Writer}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, DateTimeUtils}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.geom.GeomCodec
import graft.sources.{GdalOptions, GraftError}

/** GeoJSON write path (reference W1/W3 — src/lib.rs:499-573, 629-642),
  * Spark-shaped: each partition writes `part-NNNNN.geojson` (a complete
  * FeatureCollection), the driver commit enforces the reference's
  * EmptyDataframe error (src/lib.rs:509-511). We close the reference's
  * `todo!()` gaps for Date/Timestamp/List property values
  * (src/lib.rs:661-665) by emitting ISO-8601 strings / JSON arrays.
  *
  * Scale note: per-partition files mean the write is embarrassingly
  * parallel (a "GeoJSON-seq of collections"); the strict single-document
  * form is available via [[graft.GdalWrite.toBytes]] (inherently
  * single-node, W2 parity).
  */
object GeoJsonRowSerializer {
  /** Locate + validate the geometry column (reference src/lib.rs:523-525,
    * 713-733): Binary → WKB, String → WKT or GeoJSON per option. */
  def geometryIndex(schema: StructType, opts: GdalOptions): Int = {
    val i = schema.fieldNames.indexOf(opts.geometryColumnName)
    if (i < 0) throw new GraftError.CannotFindGeometryColumn(opts.geometryColumnName)
    schema.fields(i).dataType match {
      case BinaryType | StringType => i
      case _ => throw new GraftError.GeometryColumnWrongType(opts.geometryColumnName)
    }
  }

  def writeFeature(row: InternalRow, schema: StructType, geomIdx: Int,
      opts: GdalOptions, out: Writer): Unit = {
    out.write("""{"type":"Feature","geometry":""")
    if (row.isNullAt(geomIdx)) out.write("null")
    else schema.fields(geomIdx).dataType match {
      case BinaryType => out.write(GeomCodec.wkbToGeoJson(row.getBinary(geomIdx)))
      case StringType =>
        val s = row.getUTF8String(geomIdx).toString
        val wkb = opts.geometryFormat match {
          case "geojson" => GeomCodec.geoJsonToWkb(s)
          case _ => GeomCodec.wktToWkb(s) // wkt is the string default
        }
        out.write(GeomCodec.wkbToGeoJson(wkb))
      case _ => throw new GraftError.GeometryColumnWrongType(opts.geometryColumnName)
    }
    out.write(""","properties":{""")
    var first = true
    var i = 0
    while (i < schema.length) {
      if (i != geomIdx && !row.isNullAt(i)) { // null props skipped (ref :562-567)
        schema.fields(i).dataType match {
          case BinaryType => () // non-geometry binary prop: skipped (ref :667-668)
          case dt =>
            if (!first) out.write(",")
            first = false
            out.write(jsonString(schema.fields(i).name))
            out.write(":")
            writeValue(row, i, dt, out)
        }
      }
      i += 1
    }
    out.write("}}")
  }

  private def writeValue(row: InternalRow, i: Int, dt: DataType, out: Writer): Unit = dt match {
    case IntegerType => out.write(row.getInt(i).toString)
    case LongType => out.write(row.getLong(i).toString)
    case DoubleType => out.write(row.getDouble(i).toString)
    case FloatType => out.write(row.getFloat(i).toString)
    case BooleanType => out.write(row.getBoolean(i).toString)
    case StringType => out.write(jsonString(row.getUTF8String(i).toString))
    case DateType => // closes reference todo!() at src/lib.rs:661
      out.write(jsonString(DateTimeUtils.toJavaDate(row.getInt(i)).toString))
    case TimestampType => // closes reference todo!() at src/lib.rs:663
      out.write(jsonString(
        DateTimeUtils.toJavaTimestamp(row.getLong(i)).toInstant.toString))
    case ArrayType(et, _) => // closes reference todo!() at src/lib.rs:665
      val arr = row.getArray(i)
      out.write("[")
      var j = 0
      while (j < arr.numElements) {
        if (j > 0) out.write(",")
        writeArrayElem(arr, j, et, out)
        j += 1
      }
      out.write("]")
    case other => out.write(jsonString(row.get(i, other).toString))
  }

  private def writeArrayElem(arr: ArrayData, j: Int, et: DataType, out: Writer): Unit =
    if (arr.isNullAt(j)) out.write("null")
    else et match {
      case IntegerType => out.write(arr.getInt(j).toString)
      case LongType => out.write(arr.getLong(j).toString)
      case DoubleType => out.write(arr.getDouble(j).toString)
      case StringType => out.write(jsonString(arr.getUTF8String(j).toString))
      case other => out.write(jsonString(arr.get(j, other).toString))
    }

  def jsonString(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}

class GeoJsonWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val path = Option(info.options.get("path"))
        .getOrElse(throw new IllegalArgumentException("geojson write requires a path"))
      new GeoJsonBatchWrite(path, info.schema(), GdalOptions(info.options), doTruncate)
    }
  }
}

case class GeoJsonCommit(rows: Long, committedPaths: Seq[String] = Nil)
  extends WriterCommitMessage with graft.sources.CommittedFiles

class GeoJsonBatchWrite(path: String, schema: StructType, opts: GdalOptions,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    if (!dir.exists()) dir.mkdirs()
    if (truncate) dir.listFiles().filter(_.getName.endsWith(".geojson")).foreach(_.delete())
    if (truncate) graft.sources.AttemptFile.cleanDebris(dir)
    GeoJsonRowSerializer.geometryIndex(schema, opts) // fail fast on the driver
    new GeoJsonWriterFactory(path, graft.sources.LayerWrite.stem(dir, opts, truncate), schema, opts)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    graft.sources.AttemptFile.verifyCommitted(messages)
    val total = messages.map { case GeoJsonCommit(n, _) => n }.sum
    if (total == 0L) throw new GraftError.EmptyDataframe // ref src/lib.rs:509-511
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GeoJsonWriterFactory(path: String, stem: String, schema: StructType, opts: GdalOptions)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GeoJsonDataWriter(new File(path, f"$stem%s-$partitionId%05d.geojson"), schema, opts, taskId)
}

class GeoJsonDataWriter(file: File, schema: StructType, opts: GdalOptions,
    taskId: Long)
  extends DataWriter[InternalRow] {
  private val geomIdx = GeoJsonRowSerializer.geometryIndex(schema, opts)
  private val tmp = graft.sources.AttemptFile.temp(file, taskId)
  private val out = new BufferedWriter(
    new OutputStreamWriter(new FileOutputStream(tmp), StandardCharsets.UTF_8))
  private var n = 0L
  out.write("""{"type":"FeatureCollection","features":[""")

  override def write(row: InternalRow): Unit = {
    if (n > 0) out.write(",")
    out.write("\n")
    GeoJsonRowSerializer.writeFeature(row, schema, geomIdx, opts, out)
    n += 1
  }
  override def commit(): WriterCommitMessage = {
    out.write("\n]}\n")
    out.close()
    graft.sources.AttemptFile.promote(tmp, file)
    GeoJsonCommit(n, Seq(file.getAbsolutePath))
  }
  override def abort(): Unit = { out.close(); tmp.delete(); () }
  override def close(): Unit = ()
}
