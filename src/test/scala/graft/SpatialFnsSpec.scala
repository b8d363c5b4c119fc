package graft

import org.scalatest.funsuite.AnyFunSuite

class SpatialFnsSpec extends AnyFunSuite {
  import TestSpark._

  test("spatial measures and predicates via SQL") {
    val rows = spark.sql(
      """SELECT
        | st_area(st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')) AS area,
        | st_length(st_geomfromwkt('LINESTRING (0 0, 3 4)')) AS len,
        | st_aswkt(st_centroid(st_geomfromwkt('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))) AS ctr,
        | st_geometrytype(st_point(1.0D, 2.0D)) AS gt,
        | st_npoints(st_geomfromwkt('LINESTRING (0 0, 1 1, 2 2)')) AS np,
        | st_isvalid(st_geomfromwkt('POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))')) AS bowtie,
        | st_intersects(st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), st_point(2.0D, 2.0D)) AS hits,
        | st_contains(st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), st_point(2.0D, 2.0D)) AS cont,
        | st_within(st_point(2.0D, 2.0D), st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS within,
        | st_distance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D)) AS dist,
        | st_area(st_buffer(st_point(0.0D, 0.0D), 1.0D)) AS buf_area""".stripMargin).head
    assert(rows.getDouble(0) === 100.0)
    assert(rows.getDouble(1) === 5.0)
    assert(rows.getString(2) === "POINT (1 1)")
    assert(rows.getString(3) === "Point")
    assert(rows.getInt(4) === 3)
    assert(!rows.getBoolean(5)) // bowtie is invalid
    assert(rows.getBoolean(6) && rows.getBoolean(7) && rows.getBoolean(8))
    assert(rows.getDouble(9) === 5.0)
    // JTS buffer default is 8 segments/quadrant — area ≈ 3.121, not quite π
    assert(math.abs(rows.getDouble(10) - math.Pi) < 0.05)
  }

  test("spatial join: states containing city points") {
    val states = spark.read.format("geojson")
      .load(s"$fixtures/us_states.feature_collection.implicit_4326.json")
      .select(org.apache.spark.sql.functions.col("name"),
        org.apache.spark.sql.functions.col("geometry").as("state_geom"))
    val cities = graft.sources.arrow.ArrowRead.fromFile(spark, s"$fixtures/cities.arrow")
      .withColumnRenamed("geometry", "city_geom")
      .withColumnRenamed("name", "city")
    states.createOrReplaceTempView("sj_states")
    cities.createOrReplaceTempView("sj_cities")
    // broadcast NL join with an st_contains predicate (SURVEY §2.5 spatial row)
    val hits = spark.sql(
      """SELECT s.name AS state, c.city
        |FROM sj_states s JOIN sj_cities c
        |  ON st_contains(s.state_geom, c.city_geom)""".stripMargin).collect()
    // cities.arrow holds world capitals — the only one inside a US state
    // polygon is Washington, DC
    assert(hits.nonEmpty)
    assert(hits.map(_.getString(0)).toSet.contains("District of Columbia"))
    assert(hits.exists(_.getString(1).contains("Washington")))
  }
}
