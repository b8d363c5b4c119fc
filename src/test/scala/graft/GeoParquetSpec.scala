package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.sources.geoparquet.GeoParquet

class GeoParquetSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_gpq_$tag").toFile
    d.deleteOnExit()
    d.toString
  }

  test("round-trips geometry, props, and nulls across partitions") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(true), Some((10.0, 20.0))),
      (2L, None, Some(-2.25), Some(false), Some((-122.4, 37.8))),
      (3L, Some("gamma"), None, None, Some((0.0, 0.0))),
      (4L, Some("delta"), Some(4.0), Some(true), None)
    ).toDF("id", "tag", "score", "flag", "pt")
      .withColumn("geometry",
        when($"pt".isNotNull,
          GraftFunctions.st_point($"pt._1", $"pt._2")).otherwise(lit(null)))
      .drop("pt")
      .repartition(3)
    val dir = tmpDir("rt")
    GeoParquet.write(df, dir)

    val back = GeoParquet.read(s, dir)
    assert(back.schema("geometry").dataType.typeName === "binary")
    val rows = back
      .select($"id", $"tag", $"score", $"flag",
        when($"geometry".isNotNull, GraftFunctions.st_aswkt($"geometry")).as("wkt"))
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4))))
    assert(rows === Seq(
      (1L, Some("alpha"), Some(1.5), Some(true), Some("POINT (10 20)")),
      (2L, None, Some(-2.25), Some(false), Some("POINT (-122.4 37.8)")),
      (3L, Some("gamma"), None, None, Some("POINT (0 0)")),
      (4L, Some("delta"), Some(4.0), Some(true), None)))
    // one file per non-empty partition, all standard parquet
    val parts = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.endsWith(".parquet"))
    assert(parts.nonEmpty)
  }

  test("stamps spec-shaped geo footer metadata with bbox and types") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val df = Seq((1L, (1.0, 2.0)), (2L, (5.0, -3.0))).toDF("id", "pt")
      .withColumn("geometry", GraftFunctions.st_point($"pt._1", $"pt._2"))
      .drop("pt")
    val dir = tmpDir("meta")
    GeoParquet.write(df, dir)
    val m = GeoParquet.meta(s, dir)
    assert(m.isDefined)
    assert(m.get.primaryColumn === "geometry")
    assert(m.get.encoding === "WKB")
    assert(m.get.geometryTypes === Seq("Point"))
    assert(m.get.bbox === Some(Seq(1.0, -3.0, 5.0, 2.0)))
  }

  test("spark's own parquet reader serves the data with pushdown intact") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val df = (1L to 100L).map(i => (i, s"row$i", (i.toDouble, -i.toDouble)))
      .toDF("id", "tag", "pt")
      .withColumn("geometry", GraftFunctions.st_point($"pt._1", $"pt._2"))
      .drop("pt")
    val dir = tmpDir("push")
    GeoParquet.write(df, dir)
    val q = GeoParquet.read(s, dir).filter($"id" > 90L).select($"id", $"tag")
    assert(q.count() === 10L)
    // the filter must reach the parquet scan as a pushed filter
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90"),
      s"expected pushdown in plan:\n$plan")
  }

  test("rejects a missing or non-binary geometry column loudly") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x")).toDF("id", "geometry")
    intercept[IllegalArgumentException] {
      GeoParquet.write(df, tmpDir("bad"))
    }
    intercept[IllegalArgumentException] {
      GeoParquet.write(df.drop("geometry"), tmpDir("bad2"))
    }
  }
}
