package graft.sources.shapefile

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom._

/** Minimal ESRI Shapefile (.shp) geometry-record parser, written against the
  * public ESRI whitepaper ("ESRI Shapefile Technical Description", 1998).
  * Covers the 2D types plus Z/M variants (Z/M ordinates ignored): Null(0),
  * Point(1/11/21), PolyLine(3/13/23), Polygon(5/15/25), MultiPoint(8/18/28).
  */
object Shp {
  private val factory = new GeometryFactory(new PrecisionModel, 4326)

  /** Stream (recordNumber, record content) pairs from a .shp file,
    * optionally starting at a byte offset (from the .shx index) and capped
    * at maxRecords — the record-range split path. Content buffers are
    * little-endian-ordered at position 0, ready for [[parseShape]] or the
    * positionless [[boxIntersects]] peek. */
  def rawRecords(path: String, startByte: Long = 100L,
      maxRecords: Long = -1L): Iterator[(Int, ByteBuffer)] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    var toSkip = startByte // header is 100 bytes; splits pass .shx offsets
    while (toSkip > 0) toSkip -= in.skip(toSkip)
    var remaining = maxRecords
    new Iterator[(Int, ByteBuffer)] {
      private var nextRec: (Int, ByteBuffer) = advance()

      private def advance(): (Int, ByteBuffer) =
        if (remaining == 0) { in.close(); null }
        else try {
          val recNum = in.readInt() // big-endian
          val contentWords = in.readInt() // length in 16-bit words
          val content = new Array[Byte](contentWords * 2)
          in.readFully(content)
          if (remaining > 0) remaining -= 1
          (recNum, ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN))
        } catch {
          case _: EOFException => in.close(); null
        }

      override def hasNext: Boolean = nextRec != null
      override def next(): (Int, ByteBuffer) = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  /** Stream (recordNumber, geometry-or-null) pairs. */
  def records(path: String, startByte: Long = 100L,
      maxRecords: Long = -1L): Iterator[(Int, Geometry)] =
    rawRecords(path, startByte, maxRecords).map { case (n, b) => (n, parseShape(b)) }

  /** Cheap bbox test against the record's stored extent — absolute reads
    * only, so the buffer stays ready for [[parseShape]]. Points test x/y
    * directly; poly/multi types carry a bbox at content bytes 4..36; Null
    * shapes never match (GDAL spatial-filter semantics). Skipping here
    * avoids the whole geometry parse. */
  def boxIntersects(b: ByteBuffer, q: graft.sources.flatgeobuf.FgbIndex.Box): Boolean =
    b.getInt(0) match {
      case 0 => false
      case 1 | 11 | 21 =>
        val x = b.getDouble(4); val y = b.getDouble(12)
        x >= q.minX && x <= q.maxX && y >= q.minY && y <= q.maxY
      case _ =>
        q.intersects(graft.sources.flatgeobuf.FgbIndex.Box(
          b.getDouble(4), b.getDouble(12), b.getDouble(20), b.getDouble(28)))
    }

  /** The file-level extent from the .shp header (bytes 36..68, LE). */
  def fileBox(path: String): graft.sources.flatgeobuf.FgbIndex.Box = {
    val in = new DataInputStream(new FileInputStream(path))
    try {
      val head = new Array[Byte](68)
      in.readFully(head)
      val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
      graft.sources.flatgeobuf.FgbIndex.Box(
        bb.getDouble(36), bb.getDouble(44), bb.getDouble(52), bb.getDouble(60))
    } finally in.close()
  }

  /** Byte offset of each record in the .shp, read from the .shx index
    * (header 100 bytes, then one (offset-in-words, length-in-words)
    * big-endian pair per record). */
  def shxOffsets(shxPath: String): Array[Long] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(shxPath))
    val n = (bytes.length - 100) / 8
    val bb = ByteBuffer.wrap(bytes)
    Array.tabulate(n) { i => bb.getInt(100 + i * 8).toLong * 2 }
  }

  def parseShape(b: ByteBuffer): Geometry = b.getInt match {
    case 0 => null // Null Shape
    case 1 | 11 | 21 => factory.createPoint(new Coordinate(b.getDouble, b.getDouble))
    case 8 | 18 | 28 => // MultiPoint: box + numPoints + points
      b.position(b.position + 32)
      val n = b.getInt
      factory.createMultiPoint(
        Array.tabulate(n)(_ => factory.createPoint(new Coordinate(b.getDouble, b.getDouble))))
    case 3 | 13 | 23 => // PolyLine: box + parts + points
      val parts = readParts(b)
      if (parts.length == 1) factory.createLineString(parts(0))
      else factory.createMultiLineString(parts.map(factory.createLineString))
    case 5 | 15 | 25 => // Polygon: rings; shells are clockwise per spec
      val rings = readParts(b).map(closeRing).map(factory.createLinearRing)
      val shells = rings.filterNot(r => Orientation.isCCW(r.getCoordinateSequence))
      val holes = rings.filter(r => Orientation.isCCW(r.getCoordinateSequence))
      if (shells.isEmpty) factory.createPolygon(rings.head) // degenerate: treat first as shell
      else if (shells.length == 1) factory.createPolygon(shells(0), holes)
      else {
        // assign each hole to the first shell whose envelope contains it
        val polys = shells.map { s =>
          val sp = factory.createPolygon(s)
          val mine = holes.filter(h =>
            sp.getEnvelopeInternal.contains(h.getEnvelopeInternal))
          factory.createPolygon(s, mine)
        }
        factory.createMultiPolygon(polys)
      }
    case other => throw new IllegalArgumentException(s"Unsupported shape type $other")
  }

  /** Read the (box, numParts, numPoints, parts[], points[]) layout shared by
    * PolyLine and Polygon, returning one coordinate array per part. */
  private def readParts(b: ByteBuffer): Array[Array[Coordinate]] = {
    b.position(b.position + 32) // bounding box
    val numParts = b.getInt
    val numPoints = b.getInt
    val partIdx = Array.tabulate(numParts)(_ => b.getInt)
    val coords = Array.tabulate(numPoints)(_ => new Coordinate(b.getDouble, b.getDouble))
    Array.tabulate(numParts) { i =>
      val from = partIdx(i)
      val until = if (i + 1 < numParts) partIdx(i + 1) else numPoints
      coords.slice(from, until)
    }
  }

  private def closeRing(cs: Array[Coordinate]): Array[Coordinate] =
    if (cs.length >= 3 && cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
}
