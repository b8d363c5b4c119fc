package graft.sources.spatialite

import org.scalatest.funsuite.AnyFunSuite

/** The SQLite varint: 1-8 bytes of 0x80-tagged 7-bit groups, but the
  * 9-byte form stores a FULL 8 bits in the last byte (sqlite.org
  * fileformat2 §"A variable-length integer"). Values >= 2^56 and negative
  * longs require it. */
class SqliteVarintSpec extends AnyFunSuite {

  // the spec's canonical decoder (mirrors SqliteFile's read side)
  private def decode(b: Array[Byte]): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(i)
      v = (v << 7) | (x & 0x7F)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(8) & 0xFF), 9)
  }

  test("varint round-trips the full long range including the 9-byte form") {
    val w = new SqliteWriter()
    val values = Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L,
      (1L << 21) - 1, 1L << 21, (1L << 56) - 1, // largest 8-byte form
      1L << 56, Long.MaxValue, // 9-byte positive
      -1L, -128L, Long.MinValue) // negative → 9-byte
    values.foreach { v =>
      val enc = w.varint(v)
      val (dec, n) = decode(enc)
      assert(dec === v, s"round-trip of $v gave $dec")
      assert(n === enc.length, s"consumed $n of ${enc.length} bytes for $v")
      if (v >= 0 && v < (1L << 56))
        assert(enc.length <= 8, s"$v should not need the 9-byte form")
      else assert(enc.length === 9, s"$v requires the 9-byte form")
    }
  }
}
