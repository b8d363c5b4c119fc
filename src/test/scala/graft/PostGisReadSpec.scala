package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.remote.PostGisRead

/** The remote-source seam's SQL generation (the part runnable without a
  * database; reference src/test.rs:72-94 reads the same shape via GDAL's
  * PG driver). */
class PostGisReadSpec extends AnyFunSuite {

  test("tableQuery WKB-encodes geometry columns and quotes identifiers") {
    val q = PostGisRead.tableQuery("parcels", Seq("geom"), Seq("id", "owner"))
    assert(q === """(SELECT "id", "owner", ST_AsBinary("geom") AS "geom" FROM "parcels") AS graft_src""")
  }

  test("tableQuery forwards a WHERE pushdown and escapes embedded quotes") {
    val q = PostGisRead.tableQuery("""odd"name""", Seq("g"), Seq("a"),
      where = Some("a > 10"))
    assert(q.contains("\"odd\"\"name\""))
    assert(q.endsWith("WHERE a > 10) AS graft_src"))
  }

  test("tableQuery quotes schema-qualified names part by part") {
    val q = PostGisRead.tableQuery("public.spots", Seq("geom"), Seq("id"))
    assert(q.contains("""FROM "public"."spots""""))
    // a pre-quoted name passes through untouched
    val q2 = PostGisRead.tableQuery(""""dotted.table"""", Seq("geom"), Seq("id"))
    assert(q2.contains("""FROM "dotted.table""""))
  }
}
