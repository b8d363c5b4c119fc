package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import graft.geom.GeomCodec

/** Runtime kernels for the geometry expressions, operating directly on
  * Spark's internal types so generated code can call them statically.
  * (Each maps to a reference behavior: WKT/GeoJSON projections
  * src/lib.rs:394-406, WKT/WKB parse-for-write src/lib.rs:707-738, lat/lon
  * point synthesis README.md:46-54.)
  */
object GeomFns {
  def asWkt(wkb: Array[Byte]): UTF8String =
    UTF8String.fromString(GeomCodec.wkbToWkt(wkb))

  def asGeoJson(wkb: Array[Byte]): UTF8String =
    UTF8String.fromString(GeomCodec.wkbToGeoJson(wkb))

  def fromWkt(wkt: UTF8String): Array[Byte] =
    GeomCodec.wktToWkb(wkt.toString)

  /** Validating identity: parses the WKB (errors on garbage) and re-emits
    * canonical WKB. */
  def fromWkb(wkb: Array[Byte]): Array[Byte] =
    GeomCodec.toWkb(GeomCodec.fromWkb(wkb))

  /** Closes the reference's GeoJSON-input `todo!()` (src/lib.rs:734-736). */
  def fromGeoJson(json: UTF8String): Array[Byte] =
    GeomCodec.geoJsonToWkb(json.toString)

  def stPoint(lon: Double, lat: Double): Array[Byte] = GeomCodec.point(lon, lat)

  def stX(wkb: Array[Byte]): Double = GeomCodec.fromWkb(wkb).getCoordinate.x
  def stY(wkb: Array[Byte]): Double = GeomCodec.fromWkb(wkb).getCoordinate.y
}
