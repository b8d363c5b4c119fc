package graft.sources.shapefile

import java.io.{BufferedInputStream, DataInputStream, FileInputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Paths}

/** Minimal dBASE III/IV (.dbf) attribute reader, written against the public
  * dBASE file-format description (also mirrored by GDAL's Shapefile driver
  * docs). Field typing follows GDAL's convention: N/F with 0 decimals →
  * Integer (width < 10) / Integer64, otherwise Real; C → String; L →
  * Boolean; D → Date (YYYYMMDD).
  */
object Dbf {
  final case class Field(name: String, typ: Char, length: Int, decimals: Int)

  final case class Table(fields: Vector[Field], records: Iterator[IndexedSeq[Any]])

  def read(path: String): Table = read(path, 0L, -1L)

  /** Ranged read: skip to `startRec`, stop after `maxRecords` (-1 = all) —
    * the attribute half of a record-range split. */
  def read(path: String, startRec: Long, maxRecords: Long): Table = {
    val charset = cpgCharset(path)
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    val header = new Array[Byte](32)
    in.readFully(header)
    val totalRecords = le32(header, 4)
    val headerLen = le16(header, 8)
    val recordLen = le16(header, 10)

    val nFields = (headerLen - 33) / 32
    val fields = Vector.tabulate(nFields) { _ =>
      val fd = new Array[Byte](32)
      in.readFully(fd)
      val nameLen = fd.indexWhere(_ == 0) match { case -1 => 11; case i => math.min(i, 11) }
      Field(new String(fd, 0, nameLen, StandardCharsets.US_ASCII),
        (fd(11) & 0xff).toChar, fd(16) & 0xff, fd(17) & 0xff)
    }
    in.skipBytes(headerLen - 32 - nFields * 32) // terminator byte (+ any fill)
    var toSkip = startRec * recordLen
    while (toSkip > 0) toSkip -= in.skip(toSkip)
    val nRecords =
      if (maxRecords < 0) totalRecords - startRec
      else math.min(maxRecords, totalRecords - startRec)

    val records = new Iterator[IndexedSeq[Any]] {
      private var i = 0L
      override def hasNext: Boolean = {
        val more = i < nRecords
        if (!more) in.close()
        more
      }
      override def next(): IndexedSeq[Any] = {
        val rec = new Array[Byte](recordLen)
        in.readFully(rec)
        i += 1
        if (rec(0) == '*') IndexedSeq.fill(fields.length)(null) // deleted row
        else {
          var off = 1
          fields.map { f =>
            val raw = new String(rec, off, f.length, charset)
            off += f.length
            parse(raw, f)
          }
        }
      }
    }
    Table(fields, records)
  }

  def sparkType(f: Field): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    f.typ match {
      case 'C' => StringType
      case 'N' | 'F' =>
        if (f.decimals == 0 && f.typ == 'N') { if (f.length < 10) IntegerType else LongType }
        else DoubleType
      case 'L' => BooleanType
      case 'D' => DateType
      case _ => StringType
    }
  }

  private def parse(raw: String, f: Field): Any = {
    val s = raw.trim
    if (s.isEmpty) null
    else f.typ match {
      case 'C' => raw.replaceAll("\\s+$", "") // right-trim only
      case 'N' if f.decimals == 0 =>
        try { if (f.length < 10) Integer.valueOf(s.toInt) else java.lang.Long.valueOf(s.toLong) }
        catch { case _: NumberFormatException => null }
      case 'N' | 'F' =>
        try java.lang.Double.valueOf(s.toDouble)
        catch { case _: NumberFormatException => null }
      case 'L' => s.head match {
        case 'T' | 't' | 'Y' | 'y' => java.lang.Boolean.TRUE
        case 'F' | 'f' | 'N' | 'n' => java.lang.Boolean.FALSE
        case _ => null
      }
      case 'D' =>
        try java.sql.Date.valueOf(
          s"${s.substring(0, 4)}-${s.substring(4, 6)}-${s.substring(6, 8)}")
        catch { case _: Exception => null }
      case _ => s
    }
  }

  private def cpgCharset(dbfPath: String): Charset = {
    val cpg = Paths.get(dbfPath.replaceAll("\\.dbf$", ".cpg"))
    if (Files.exists(cpg)) {
      val name = new String(Files.readAllBytes(cpg), StandardCharsets.US_ASCII).trim
      try Charset.forName(name.replace("UTF 8", "UTF-8"))
      catch { case _: Exception => StandardCharsets.ISO_8859_1 }
    } else StandardCharsets.ISO_8859_1
  }

  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
}
