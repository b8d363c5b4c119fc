package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ShapefileWriteSpec extends AnyFunSuite {
  import TestSpark._

  test("shapefile write -> read round trip (points + string fields)") {
    val out = java.nio.file.Files.createTempDirectory("graft_shpw_").toString
    val src = spark.read.format("shapefile").load(s"$fixtures/stations.shp")
    src.coalesce(1).write.format("shapefile").mode("overwrite").save(out)
    assert(new java.io.File(out).listFiles().map(_.getName).count(_.endsWith(".shp")) === 1)
    val back = spark.read.format("shapefile").load(out)
    assert(back.count() === 86)
    val a = src.select("name").collect().map(_.getString(0)).sorted
    val b = back.select("name").collect().map(_.getString(0)).sorted
    assert(a.toSeq === b.toSeq)
    // geometry round trip: same WKT points
    val wa = src.selectExpr("st_aswkt(geometry) w").collect().map(_.getString(0)).sorted
    val wb = back.selectExpr("st_aswkt(geometry) w").collect().map(_.getString(0)).sorted
    assert(wa.toSeq === wb.toSeq)
  }

  test("shapefile write: polygons with numeric/bool fields round trip") {
    val s = spark; import s.implicits._
    import graft.functions.GraftFunctions._
    val out = java.nio.file.Files.createTempDirectory("graft_shpp_").toString
    val df = Seq(
      ("alpha", 3L, 1.25, true, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      ("beta", -7L, -2.5, false,
        "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10), (12 12, 14 12, 14 14, 12 14, 12 12))"))
      .toDF("label", "n", "x", "flag", "wkt")
      .withColumn("geometry", st_geomfromwkt($"wkt")).drop("wkt")
    df.coalesce(1).write.format("shapefile").mode("overwrite").save(out)
    val back = spark.read.format("shapefile").load(out).orderBy("label")
    assert(back.schema("n").dataType === LongType)
    assert(back.schema("x").dataType === DoubleType)
    assert(back.schema("flag").dataType === BooleanType)
    val rows = back.selectExpr("label", "n", "x", "flag", "st_area(geometry) a").collect()
    assert(rows(0).getString(0) === "alpha" && rows(0).getLong(1) === 3L &&
      rows(0).getDouble(2) === 1.25 && rows(0).getBoolean(3) && rows(0).getDouble(4) === 16.0)
    assert(rows(1).getLong(1) === -7L && !rows(1).getBoolean(3) &&
      rows(1).getDouble(4) === 96.0) // 100 - 4 hole
  }
}
