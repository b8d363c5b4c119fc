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

  /** Stream (recordNumber, geometry-or-null) pairs from a .shp file. */
  def records(path: String): Iterator[(Int, Geometry)] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path)))
    in.skipBytes(100) // fixed 100-byte header
    new Iterator[(Int, Geometry)] {
      private var nextRec: (Int, Geometry) = advance()

      private def advance(): (Int, Geometry) =
        try {
          val recNum = in.readInt() // big-endian
          val contentWords = in.readInt() // length in 16-bit words
          val content = new Array[Byte](contentWords * 2)
          in.readFully(content)
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
