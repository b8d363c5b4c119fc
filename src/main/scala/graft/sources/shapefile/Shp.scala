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

  /** Stream (recordNumber, geometry-or-null) pairs from a .shp file,
    * optionally starting at a byte offset (from the .shx index) and capped
    * at maxRecords — the record-range split path. */
  def records(path: String, startByte: Long = 100L,
      maxRecords: Long = -1L): Iterator[(Int, Geometry)] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    var toSkip = startByte // header is 100 bytes; splits pass .shx offsets
    while (toSkip > 0) toSkip -= in.skip(toSkip)
    var remaining = maxRecords
    new Iterator[(Int, Geometry)] {
      private var nextRec: (Int, Geometry) = advance()

      private def advance(): (Int, Geometry) =
        if (remaining == 0) { in.close(); null }
        else try {
          val recNum = in.readInt() // big-endian
          val contentWords = in.readInt() // length in 16-bit words
          val content = new Array[Byte](contentWords * 2)
          in.readFully(content)
          if (remaining > 0) remaining -= 1
          (recNum, parseShape(ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)))
        } catch {
          case _: EOFException => in.close(); null
        }

      override def hasNext: Boolean = nextRec != null
      override def next(): (Int, Geometry) = {
        val r = nextRec; nextRec = advance(); r
      }
    }
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
