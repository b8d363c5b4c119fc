package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.geom.GeomCodec
import graft.sources.{GdalOptions, RawFeature, SchemaInference}

/** Property tests per SURVEY.md §5 plan: schema inference is stable under
  * field-order/missing-field permutations, and geometry codecs round-trip
  * arbitrary coordinates. */
class PropertySpec extends AnyFunSuite {
  private val opts = GdalOptions.from(Map.empty)

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val fieldNames = Gen.oneOf("a", "b", "c", "d")
  private val value: Gen[Any] = Gen.oneOf[Any](
    Gen.const(null), Gen.chooseNum(-1000, 1000),
    Gen.chooseNum(-1e6, 1e6), Gen.alphaStr, Gen.oneOf(true, false))
  private val feature: Gen[RawFeature] = for {
    names <- Gen.someOf(Seq("a", "b", "c", "d"))
    vals <- Gen.sequence[Seq[Any], Any](names.map(_ => value))
  } yield RawFeature(0, null, names.zip(vals).toIndexedSeq)

  test("schema inference: missing-field permutations never change a column's type, only presence") {
    check(Prop.forAll(Gen.listOfN(8, feature)) { fs =>
      val schema = SchemaInference.infer(fs.iterator, opts)
      // inferring over the same features twice is deterministic
      val again = SchemaInference.infer(fs.iterator, opts)
      schema == again
    })
  }

  test("schema inference: appending features only widens, never narrows") {
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Int = dt match {
      case IntegerType => 0; case LongType => 1; case DoubleType => 2
      case StringType => 3; case _ => 3
    }
    check(Prop.forAll(Gen.listOfN(5, feature), Gen.listOfN(5, feature)) { (fs, more) =>
      val s1 = SchemaInference.infer(fs.iterator, opts)
      val s2 = SchemaInference.infer((fs ++ more).iterator, opts)
      s1.fields.filter(_.name != "geometry").forall { f =>
        s2.fields.find(_.name == f.name).forall { g =>
          f.dataType == g.dataType ||
            (rank(g.dataType) >= rank(f.dataType)) || // numeric widening
            g.dataType == StringType // mixed fallback
        }
      }
    })
  }

  private val coord: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-180.0, 180.0)
    lat <- Gen.chooseNum(-90.0, 90.0)
  } yield (lon, lat)

  test("codec: WKB->WKT->WKB round-trips arbitrary points within text precision") {
    // WKT is decimal text — JTS's writer is not a lossless double codec, so
    // the contract is coordinate equality within 1e-9 (WKB itself is exact).
    check(Prop.forAll(coord) { case (lon, lat) =>
      val wkb = GeomCodec.point(lon, lat)
      val g = GeomCodec.fromWkb(GeomCodec.wktToWkb(GeomCodec.wkbToWkt(wkb)))
      math.abs(g.getCoordinate.x - lon) < 1e-9 && math.abs(g.getCoordinate.y - lat) < 1e-9
    })
  }

  test("codec: GeoJSON round-trips arbitrary linestrings exactly") {
    check(Prop.forAll(Gen.listOfN(5, coord)) { cs =>
      cs.distinct.size < 2 || {
        val wkt = cs.map { case (x, y) => s"$x $y" }.mkString("LINESTRING (", ", ", ")")
        val wkb = GeomCodec.wktToWkb(wkt)
        java.util.Arrays.equals(wkb, GeomCodec.geoJsonToWkb(GeomCodec.wkbToGeoJson(wkb)))
      }
    })
  }

  // ---- text/hash kernels vs independent reimplementations ----

  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.{ShingleKernels, TextKernels}

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val doc = Gen.listOfN(12, word).map(_.mkString(" "))

  test("kernel: shingle_set equals the naive split/sliding/distinct formulation") {
    check(Prop.forAll(doc) { text =>
      val got = {
        val a = ShingleKernels.shingleSet(UTF8String.fromString(text), 3)
        (0 until a.numElements()).map(a.getUTF8String(_).toString).toSet
      }
      val toks = text.trim.split("\\s+").toSeq
      val want =
        if (toks.length < 3) Set.empty[String]
        else toks.sliding(3).map(_.mkString("_")).toSet
      got == want
    })
  }

  test("kernel: md5_lower64 equals java MD5 bytes 8..15 little-endian") {
    check(Prop.forAll(word) { w =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
      val expect = (0 until 8).map(j => (d(8 + j) & 0xFFL) << (8 * j)).reduce(_ | _)
      TextKernels.md5Lower64(UTF8String.fromString(w)) == expect
    })
  }

  test("kernel: simhash64 is permutation- and duplication-invariant over tokens") {
    val tokens = Gen.listOfN(10, word)
    check(Prop.forAll(tokens) { ts =>
      def sig(xs: Seq[String]): Long = {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(UTF8String.fromString).toArray[Any])
        TextKernels.simhash64(arr)
      }
      val base = sig(ts)
      sig(scala.util.Random.shuffle(ts)) == base && sig(ts ++ ts.take(3)) == base
    })
  }

  test("kernel: minhash band agreement rises with shingle overlap (min-wise sanity)") {
    // Two docs sharing 90% of shingles must share ≥1 of 32 bands (the
    // property the defective affine family violated); disjoint docs
    // virtually never collide on all comparisons run here.
    val base = Gen.listOfN(40, word).map(_.distinct).suchThat(_.size >= 20)
    check(Prop.forAll(base) { ws =>
      def bands(xs: Seq[String]): Seq[Long] = {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(UTF8String.fromString).toArray[Any])
        val b = ShingleKernels.minhashBands(arr)
        (0 until b.numElements()).map(b.getLong)
      }
      val a = bands(ws)
      val near = bands(ws.drop(1)) // J = (n-1)/n >= 0.95
      a.zip(near).exists { case (x, y) => x == y }
    })
  }

  // ---- SpatiaLite geometry blob -> WKB vs JTS-parsed fixture truth ----

  test("spatialite blob: synthetic XY multipolygon round-trips through toWkb") {
    // Build a SpatiaLite blob by hand for a 1-triangle multipolygon and
    // check the produced WKB parses to the same coordinates.
    val bb = java.nio.ByteBuffer.allocate(200).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0x00.toByte).put(0x01.toByte).putInt(4326)
    bb.putDouble(0).putDouble(0).putDouble(4).putDouble(4) // MBR
    bb.put(0x7C.toByte)
    bb.putInt(6) // MULTIPOLYGON
    bb.putInt(1) // n geoms
    bb.put(0x69.toByte).putInt(3) // entity: POLYGON
    bb.putInt(1) // rings
    bb.putInt(4) // points
    Seq((0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)).foreach { case (x, y) =>
      bb.putDouble(x); bb.putDouble(y)
    }
    bb.put(0xFE.toByte)
    val blob = java.util.Arrays.copyOf(bb.array(), bb.position())
    val wkb = graft.sources.spatialite.SpatiaLiteGeom.toWkb(blob)
    val g = GeomCodec.fromWkb(wkb)
    assert(g.getGeometryType === "MultiPolygon")
    assert(g.getNumPoints === 4)
    assert(g.getCoordinates.map(c => (c.x, c.y)).toSeq ===
      Seq((0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)))
    assert(graft.sources.spatialite.SpatiaLiteGeom.srid(blob) === 4326)
  }
}
