package graft.sources.remote

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Remote-source seam (reference S6: http(s) URLs and PostGIS URIs,
  * src/lib.rs:261-293, src/test.rs:72-94). This container has zero egress
  * and no JDBC driver, so the network paths cannot run here — but the
  * reference behavior is a thin composition over Spark's own JDBC source,
  * and this object IS that composition, kept testable by separating SQL
  * generation from execution.
  *
  * PostGIS convention: geometry columns are projected as
  * `ST_AsBinary(col)` (WKB — our stored form) and every other column is
  * passed through. At scale, partition the read on a numeric key
  * (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` are
  * forwarded verbatim to the JDBC source) so executors issue parallel
  * range queries instead of one serial cursor.
  */
object PostGisRead {

  /** The pushdown subquery for a PostGIS table: geometry columns WKB-encoded
    * at the database (ST_AsBinary), others verbatim. */
  def tableQuery(table: String, geometryColumns: Seq[String],
      otherColumns: Seq[String], where: Option[String] = None): String = {
    val cols = (otherColumns.map(quote) ++
      geometryColumns.map(g => s"ST_AsBinary(${quote(g)}) AS ${quote(g)}")).mkString(", ")
    val filter = where.map(w => s" WHERE $w").getOrElse("")
    s"(SELECT $cols FROM ${quoteQualified(table)}$filter) AS graft_src"
  }

  private def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** Table names quote each dot-separated part separately so a
    * schema-qualified `public.spots` becomes `"public"."spots"`, not one
    * identifier with a dot in it. (A table whose NAME contains a literal
    * dot must be passed pre-quoted.) */
  private def quoteQualified(ident: String): String =
    if (ident.startsWith("\"")) ident
    else ident.split('.').map(quote).mkString(".")

  /** Execute the read through Spark's JDBC source (requires a PostgreSQL
    * driver on the classpath and network reachability — neither exists in
    * this container; the SQL-generation seam above is unit-tested). */
  def read(spark: SparkSession, jdbcUrl: String, table: String,
      geometryColumns: Seq[String], otherColumns: Seq[String],
      where: Option[String] = None,
      jdbcOptions: Map[String, String] = Map.empty): DataFrame =
    jdbcOptions.foldLeft(
      spark.read.format("jdbc")
        .option("url", jdbcUrl)
        .option("dbtable", tableQuery(table, geometryColumns, otherColumns, where))
    ) { case (r, (k, v)) => r.option(k, v) }.load()
}
