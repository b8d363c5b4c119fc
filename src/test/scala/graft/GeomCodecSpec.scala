package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.GeomCodec

class GeomCodecSpec extends AnyFunSuite {
  private val samples = Seq(
    "POINT (30 10)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
    "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "GEOMETRYCOLLECTION (POINT (40 10), LINESTRING (10 10, 20 20, 10 40))")

  test("WKT -> WKB -> WKT round trip") {
    for (wkt <- samples) {
      assert(GeomCodec.wkbToWkt(GeomCodec.wktToWkb(wkt)) === wkt)
    }
  }

  test("WKB -> GeoJSON -> WKB round trip") {
    for (wkt <- samples) {
      val wkb = GeomCodec.wktToWkb(wkt)
      val json = GeomCodec.wkbToGeoJson(wkb)
      val back = GeomCodec.geoJsonToWkb(json)
      assert(GeomCodec.wkbToWkt(back) === wkt, s"via $json")
    }
  }

  test("GeoJSON text form is valid and typed") {
    val json = GeomCodec.wkbToGeoJson(GeomCodec.wktToWkb("POINT (30.5 -10.25)"))
    assert(json === """{"type":"Point","coordinates":[30.5,-10.25]}""")
  }

  test("st_point builds a lon/lat WKB point") {
    val wkb = GeomCodec.point(5.0, 52.0)
    assert(GeomCodec.wkbToWkt(wkb) === "POINT (5 52)")
  }
}
