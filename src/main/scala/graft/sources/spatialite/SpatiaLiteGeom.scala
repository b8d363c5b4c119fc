package graft.sources.spatialite

import java.nio.{ByteBuffer, ByteOrder}

/** SpatiaLite internal geometry BLOB → standard WKB.
  *
  * Blob layout (public SpatiaLite BLOB-Geometry format): 0x00 start
  * marker, endianness byte, int32 SRID, 4×double MBR, 0x7C MBR-end
  * marker, then a WKB-like body (class int32 + coordinates, with each
  * collection entity prefixed by a 0x69 marker + class), 0xFE end marker.
  * Classes: 1-7 XY; +1000 XYZ, +2000 XYM, +3000 XYZM; +1000000 compressed
  * (line/ring coordinates after the first vertex are float32 deltas).
  *
  * Output is standard little-endian WKB; Z/M variants keep the ISO type
  * code (+1000/+2000/+3000). The reference reads these through GDAL
  * (src/test.rs:37-39); this is a from-spec reimplementation.
  */
object SpatiaLiteGeom {

  def toWkb(blob: Array[Byte]): Array[Byte] = {
    if (blob == null || blob.length < 44 || blob(0) != 0x00 || blob(38) != 0x7C) return null
    val order = if (blob(1) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val in = ByteBuffer.wrap(blob, 39, blob.length - 40).order(order)
    val out = new java.io.ByteArrayOutputStream()
    writeGeom(in, in.getInt(), out)
    out.toByteArray
  }

  /** SRID of the blob (not carried into plain WKB; exposed for callers). */
  def srid(blob: Array[Byte]): Int =
    ByteBuffer.wrap(blob, 2, 4)
      .order(if (blob(1) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      .getInt()

  private def writeGeom(in: ByteBuffer, cls: Int, out: java.io.ByteArrayOutputStream): Unit = {
    val compressed = cls >= 1000000
    val cls1 = cls % 1000000
    val base = cls1 % 1000
    val dimCls = cls1 / 1000 // 0=XY 1=XYZ 2=XYM 3=XYZM
    val dims = dimCls match {
      case 0 => 2
      case 1 | 2 => 3
      case 3 => 4
      case d => throw new IllegalStateException(s"bad SpatiaLite dimension class $d")
    }
    val w = ByteBuffer.allocate(9).order(ByteOrder.LITTLE_ENDIAN)
    w.put(1.toByte).putInt(dimCls * 1000 + base)
    out.write(w.array(), 0, 5)

    base match {
      case 1 => // POINT (never compressed)
        writeCoords(in, out, 1, dims, dimCls, compressed = false)
      case 2 => // LINESTRING
        val n = in.getInt()
        writeInt(out, n)
        writeCoords(in, out, n, dims, dimCls, compressed)
      case 3 => // POLYGON
        val nRings = in.getInt()
        writeInt(out, nRings)
        var r = 0
        while (r < nRings) {
          val n = in.getInt()
          writeInt(out, n)
          writeCoords(in, out, n, dims, dimCls, compressed)
          r += 1
        }
      case 4 | 5 | 6 | 7 => // MULTI* / GEOMETRYCOLLECTION
        val n = in.getInt()
        writeInt(out, n)
        var i = 0
        while (i < n) {
          val marker = in.get()
          require(marker == 0x69, f"expected entity marker 0x69, got 0x$marker%02x")
          writeGeom(in, in.getInt(), out)
          i += 1
        }
      case b => throw new IllegalStateException(s"bad SpatiaLite geometry class $b")
    }
  }

  /** Copy `n` vertices of `dims` ordinates. Compressed lines/rings store
    * vertex 0 full-width and later x/y/z as float32 deltas; an m ordinate
    * (last of XYM, 4th of XYZM) is always a full double. */
  private def writeCoords(in: ByteBuffer, out: java.io.ByteArrayOutputStream,
      n: Int, dims: Int, dimCls: Int, compressed: Boolean): Unit = {
    val w = ByteBuffer.allocate(8 * dims).order(ByteOrder.LITTLE_ENDIAN)
    val last = new Array[Double](dims)
    var i = 0
    while (i < n) {
      w.clear()
      var d = 0
      while (d < dims) {
        val isM = (dimCls == 2 && d == 2) || (dimCls == 3 && d == 3)
        val full = !compressed || i == 0 || isM
        val v = if (full) in.getDouble() else last(d) + in.getFloat()
        last(d) = v
        w.putDouble(v)
        d += 1
      }
      out.write(w.array(), 0, 8 * dims)
      i += 1
    }
  }

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    val w = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    w.putInt(v)
    out.write(w.array(), 0, 4)
  }

  // ----------------------------------------------------------- encoding

  import org.locationtech.jts.geom._

  /** JTS geometry → SpatiaLite BLOB (uncompressed XY classes, little
    * endian) — the write-side inverse of [[toWkb]]. */
  def fromJts(g: Geometry, srid: Int): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    writeClassAndBody(g, body)
    val env = g.getEnvelopeInternal
    val head = ByteBuffer.allocate(39).order(ByteOrder.LITTLE_ENDIAN)
    head.put(0x00.toByte).put(0x01.toByte).putInt(srid)
    head.putDouble(env.getMinX).putDouble(env.getMinY)
    head.putDouble(env.getMaxX).putDouble(env.getMaxY)
    head.put(0x7C.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.array(), 0, 39)
    body.writeTo(out)
    out.write(0xFE)
    out.toByteArray
  }

  private def classOf(g: Geometry): Int = g match {
    case _: Point => 1
    case _: LineString => 2
    case _: Polygon => 3
    case _: MultiPoint => 4
    case _: MultiLineString => 5
    case _: MultiPolygon => 6
    case _: GeometryCollection => 7
  }

  private def writeClassAndBody(g: Geometry, out: java.io.ByteArrayOutputStream): Unit = {
    writeInt(out, classOf(g))
    g match {
      case p: Point => writePts(out, Array(p.getCoordinate))
      case l: LineString =>
        writeInt(out, l.getNumPoints)
        writePts(out, l.getCoordinates)
      case p: Polygon =>
        val rings = p.getExteriorRing +:
          (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
        writeInt(out, rings.length)
        rings.foreach { r =>
          writeInt(out, r.getNumPoints)
          writePts(out, r.getCoordinates)
        }
      case m: GeometryCollection => // also Multi*
        writeInt(out, m.getNumGeometries)
        (0 until m.getNumGeometries).foreach { i =>
          out.write(0x69)
          writeClassAndBody(m.getGeometryN(i), out)
        }
    }
  }

  private def writePts(out: java.io.ByteArrayOutputStream, cs: Array[Coordinate]): Unit = {
    val w = ByteBuffer.allocate(16 * cs.length).order(ByteOrder.LITTLE_ENDIAN)
    cs.foreach { c => w.putDouble(c.x); w.putDouble(c.y) }
    out.write(w.array(), 0, 16 * cs.length)
  }
}
