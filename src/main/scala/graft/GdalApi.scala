package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{GdalOptions, GraftError}
import graft.sources.geojson.GeoJsonRowSerializer

/** Byte-level entry points mirroring the reference's `df_from_bytes` /
  * `gdal_bytes_from_df` (S2/W2 — reference src/lib.rs:174-259, 586-611).
  * The filename hint drives format sniffing exactly like the reference's
  * `/vsimem/` name rule (zipped shapefiles REQUIRE an `.shp.zip` hint,
  * src/lib.rs:163-165, src/test.rs:49-51).
  */
object GdalRead {
  /** Read a DataFrame from raw bytes. Materializes to a process-unique temp
    * file (the JVM stand-in for `/vsimem/`) and routes by hint. */
  def fromBytes(spark: SparkSession, data: Array[Byte], filenameHint: Option[String] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    if (data.isEmpty) throw new GraftError.EmptyData // ref src/lib.rs:205-207
    val hint = filenameHint.getOrElse("buffer.geojson").toLowerCase
    val fmt =
      if (hint.endsWith(".shp.zip") || hint.endsWith(".zip")) "shapefile"
      else if (hint.endsWith(".csv")) "csvgeo"
      else "geojson"
    val suffix = hint.drop(math.max(0, hint.length - 12)).replaceAll("[^a-z0-9.]", "_")
    val tmp = File.createTempFile("graft_bytes_", "_" + suffix)
    tmp.deleteOnExit()
    Files.write(tmp.toPath, data)
    options.foldLeft(spark.read.format(fmt)) { case (r, (k, v)) => r.option(k, v) }
      .load(tmp.getAbsolutePath)
  }
}

object GdalWrite {
  /** Serialize a DataFrame to a single GeoJSON FeatureCollection byte
    * array. Collect-based by design: a bytes result is inherently
    * single-node (reference W2); the scalable path is
    * `df.write.format("geojson")`. */
  def toBytes(df: DataFrame, options: Map[String, String] = Map.empty): Array[Byte] = {
    val opts = GdalOptions.from(options)
    val schema = df.schema
    val geomIdx = GeoJsonRowSerializer.geometryIndex(schema, opts)
    val sb = new java.io.StringWriter
    sb.write("""{"type":"FeatureCollection","features":[""")
    var n = 0L
    val it = df.queryExecution.toRdd.toLocalIterator // InternalRow stream
    while (it.hasNext) {
      if (n > 0) sb.write(",")
      sb.write("\n")
      GeoJsonRowSerializer.writeFeature(it.next(), schema, geomIdx, opts, sb)
      n += 1
    }
    if (n == 0) throw new GraftError.EmptyDataframe // ref src/lib.rs:509-511
    sb.write("\n]}\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }
}
