package graft.sources.spatialite

import scala.collection.mutable.ArrayBuffer

/** Minimal SQLite 3 database FILE writer — the write-side complement of
  * [[SqliteFile]], from the same public file format: serial-type records,
  * bottom-up table b-tree construction (leaf packing → interior levels),
  * overflow-page chains for big payloads (vector geometries), and a
  * page-1 sqlite_master. Produces databases the real sqlite3 library
  * opens (conformance-tested by shelling out to python's sqlite3 in
  * SpatiaLiteWriteSpec).
  *
  * Scope: brand-new single-file databases, rowid tables, UTF-8, no
  * indices, no freelist — what a SpatiaLite layer export needs.
  */
final class SqliteWriter(pageSize: Int = 4096) {
  require(pageSize >= 512 && (pageSize & (pageSize - 1)) == 0)

  private val u = pageSize // usable (reserved = 0)
  private val maxLeafLocal = u - 35
  private val minLocal = (u - 12) * 32 / 255 - 23

  /** 1-based page store; index i holds page i+1. Page 1 reserved. */
  private val pages = ArrayBuffer[Array[Byte]](new Array[Byte](pageSize))

  private def allocPage(): Int = { pages += new Array[Byte](pageSize); pages.length }

  private def be16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 8) & 0xFF).toByte; b(off + 1) = (v & 0xFF).toByte
  }
  private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = ((v >> 16) & 0xFF).toByte
    b(off + 2) = ((v >> 8) & 0xFF).toByte; b(off + 3) = (v & 0xFF).toByte
  }

  private[spatialite] def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 0x7F) return Array(v.toByte)
    if (v < 0 || v >= (1L << 56)) {
      // SQLite's 9-byte form stores a full 8 bits in the LAST byte (not a
      // 7-bit group), so values past 2^56-1 — and negative longs — need
      // the dedicated layout: eight 0x80-tagged 7-bit groups + low byte.
      val out = new Array[Byte](9)
      out(8) = (v & 0xFF).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7F) | 0x80).toByte; x >>>= 7; i -= 1 }
      return out
    }
    val out = ArrayBuffer[Byte]()
    var x = v
    val bytes = new Array[Byte](9)
    var n = 0
    while (x != 0) { bytes(n) = (x & 0x7F).toByte; x >>>= 7; n += 1 }
    var i = n - 1
    while (i >= 0) {
      out += (if (i == 0) bytes(i) else (bytes(i) | 0x80).toByte)
      i -= 1
    }
    out.toArray
  }

  // ------------------------------------------------------- record codec

  /** Encode values (null, Long, Double, String, Array[Byte]) as a record. */
  def encodeRecord(values: Seq[Any]): Array[Byte] = {
    val bodies = ArrayBuffer[Array[Byte]]()
    val serials = values.map {
      case null => bodies += Array.emptyByteArray; 0L
      case l: Long =>
        val (serial, width) =
          if (l >= -128 && l <= 127) (1, 1)
          else if (l >= -32768 && l <= 32767) (2, 2)
          else if (l >= -8388608 && l <= 8388607) (3, 3)
          else if (l >= Int.MinValue && l <= Int.MaxValue) (4, 4)
          else if (l >= -140737488355328L && l <= 140737488355327L) (5, 6)
          else (6, 8)
        val b = new Array[Byte](width)
        var i = 0
        while (i < width) { b(width - 1 - i) = ((l >> (8 * i)) & 0xFF).toByte; i += 1 }
        bodies += b
        serial.toLong
      case d: Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        val b = new Array[Byte](8)
        var i = 0
        while (i < 8) { b(7 - i) = ((bits >> (8 * i)) & 0xFF).toByte; i += 1 }
        bodies += b
        7L
      case s: String =>
        val b = s.getBytes("UTF-8"); bodies += b; 13L + 2L * b.length
      case blob: Array[Byte] =>
        bodies += blob; 12L + 2L * blob.length
      case other => throw new IllegalArgumentException(s"unsupported value $other")
    }
    val serialBytes = serials.map(varint)
    // header length includes its own varint — fixed point on the width
    val base = serialBytes.map(_.length).sum
    var headerLen = base + 1
    while (base + varint(headerLen.toLong).length != headerLen)
      headerLen = base + varint(headerLen.toLong).length
    val out = ArrayBuffer[Byte]()
    out ++= varint(headerLen)
    serialBytes.foreach(out ++= _)
    bodies.foreach(out ++= _)
    out.toArray
  }

  // --------------------------------------------------- b-tree construction

  /** Build a table b-tree from (rowid, record) rows in rowid order;
    * returns the root page number. */
  def buildTableBtree(rows: Seq[(Long, Array[Byte])]): Int = {
    case class Leaf(page: Int, maxRowid: Long)
    val leaves = ArrayBuffer[Leaf]()
    var cells = ArrayBuffer[Array[Byte]]() // full leaf-cell images
    var cellBytes = 0
    var lastRowid = 0L

    def flushLeaf(): Unit = {
      if (cells.isEmpty) return
      val pno = allocPage()
      val p = pages(pno - 1)
      p(0) = 0x0D
      be16(p, 3, cells.length)
      var contentStart = pageSize
      cells.zipWithIndex.foreach { case (c, i) =>
        contentStart -= c.length
        System.arraycopy(c, 0, p, contentStart, c.length)
        be16(p, 8 + 2 * i, contentStart)
      }
      be16(p, 5, contentStart)
      leaves += Leaf(pno, lastRowid)
      cells = ArrayBuffer[Array[Byte]]()
      cellBytes = 0
    }

    rows.foreach { case (rowid, payload) =>
      val cell = leafCell(rowid, payload)
      if (cells.nonEmpty && 8 + 2 * (cells.length + 1) + cellBytes + cell.length > pageSize)
        flushLeaf()
      cells += cell
      cellBytes += cell.length
      lastRowid = rowid
    }
    flushLeaf()
    if (leaves.isEmpty) { // empty table: one empty leaf
      val pno = allocPage()
      val p = pages(pno - 1)
      p(0) = 0x0D
      be16(p, 5, pageSize)
      return pno
    }

    // interior levels until a single root
    var level = leaves.map(l => (l.page, l.maxRowid)).toSeq
    while (level.length > 1) {
      val next = ArrayBuffer[(Int, Long)]()
      var group = ArrayBuffer[(Int, Long)]()
      var groupBytes = 0
      def flushInterior(): Unit = {
        if (group.isEmpty) return
        val pno = allocPage()
        val p = pages(pno - 1)
        p(0) = 0x05
        val cellsHere = group.dropRight(1)
        be16(p, 3, cellsHere.length)
        be32(p, 8, group.last._1) // rightmost child
        var contentStart = pageSize
        cellsHere.zipWithIndex.foreach { case ((child, maxRow), i) =>
          val kc = varint(maxRow)
          contentStart -= 4 + kc.length
          be32(p, contentStart, child)
          System.arraycopy(kc, 0, p, contentStart + 4, kc.length)
          be16(p, 12 + 2 * i, contentStart)
        }
        be16(p, 5, contentStart)
        next += ((pno, group.last._2))
        group = ArrayBuffer[(Int, Long)]()
        groupBytes = 0
      }
      level.foreach { case (page, maxRow) =>
        val cellSize = 4 + varint(maxRow).length
        if (group.nonEmpty && 12 + 2 * group.length + groupBytes + cellSize + 4 > pageSize)
          flushInterior()
        group += ((page, maxRow))
        groupBytes += cellSize
      }
      flushInterior()
      level = next.toSeq
    }
    level.head._1
  }

  /** A complete leaf-cell image (varints + local payload + overflow ptr),
    * allocating overflow pages as needed. */
  private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val p = payload.length
    if (p <= maxLeafLocal) {
      val out = ArrayBuffer[Byte]()
      out ++= varint(p.toLong); out ++= varint(rowid); out ++= payload
      out.toArray
    } else {
      val k = minLocal + (p - minLocal) % (u - 4)
      val local = if (k <= maxLeafLocal) k else minLocal
      // overflow chain
      var off = local
      var firstPage = 0
      var prevPage = 0
      while (off < p) {
        val pno = allocPage()
        if (firstPage == 0) firstPage = pno
        if (prevPage != 0) be32(pages(prevPage - 1), 0, pno)
        val take = math.min(u - 4, p - off)
        System.arraycopy(payload, off, pages(pno - 1), 4, take)
        off += take
        prevPage = pno
      }
      val out = ArrayBuffer[Byte]()
      out ++= varint(p.toLong); out ++= varint(rowid)
      out ++= payload.take(local)
      val ptr = new Array[Byte](4); be32(ptr, 0, firstPage)
      out ++= ptr
      out.toArray
    }
  }

  // ------------------------------------------------------------- finish

  /** Write sqlite_master onto page 1 and serialize the database.
    * `master` = (name, tblName, rootPage, sql) per table. */
  def finish(master: Seq[(String, String, Int, String)]): Array[Byte] = {
    val p1 = pages(0)
    // file header
    "SQLite format 3 ".getBytes("ISO-8859-1").copyToArray(p1, 0)
    be16(p1, 16, if (pageSize == 65536) 1 else pageSize)
    p1(18) = 1; p1(19) = 1 // file format write/read versions (legacy)
    p1(20) = 0 // reserved per page
    p1(21) = 64; p1(22) = 32; p1(23) = 32 // payload fractions (fixed)
    be32(p1, 24, 1) // change counter
    be32(p1, 28, pages.length) // database size in pages
    be32(p1, 40, 1) // schema cookie
    be32(p1, 44, 1) // schema format number 1 (maximum compatibility)
    be32(p1, 56, 1) // text encoding UTF-8
    be32(p1, 92, 1) // version-valid-for
    be32(p1, 96, 3045001) // library version number
    // master leaf b-tree in the remainder of page 1
    val cells = master.zipWithIndex.map { case ((name, tbl, root, sql), i) =>
      val rec = encodeRecord(Seq("table", name, tbl, root.toLong, sql))
      require(rec.length <= maxLeafLocal, "master row too large")
      val out = ArrayBuffer[Byte]()
      out ++= varint(rec.length.toLong); out ++= varint(i + 1L); out ++= rec
      out.toArray
    }
    p1(100) = 0x0D
    be16(p1, 103, cells.length)
    var contentStart = pageSize
    cells.zipWithIndex.foreach { case (c, i) =>
      contentStart -= c.length
      System.arraycopy(c, 0, p1, contentStart, c.length)
      be16(p1, 108 + 2 * i, contentStart)
    }
    be16(p1, 105, contentStart)

    val out = new Array[Byte](pages.length * pageSize)
    pages.zipWithIndex.foreach { case (p, i) => System.arraycopy(p, 0, out, i * pageSize, pageSize) }
    out
  }
}
