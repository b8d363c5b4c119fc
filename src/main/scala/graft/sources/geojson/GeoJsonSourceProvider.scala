package graft.sources.geojson

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources._

/** `spark.read.format("geojson")` / `df.write.format("geojson")` (S1 + W3,
  * reference src/lib.rs:294-312, 629-642). */
class GeoJsonSourceProvider extends FeatureSourceProvider {
  override def shortName(): String = "geojson"
  override def format: FeatureFormat = new GeoJsonFormat

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = GdalOptions.from(properties.asScala.toMap)
    val paths = Option(properties.get("path")).toSeq
    val files =
      if (paths.nonEmpty && new java.io.File(paths.head).exists())
        FeatureFormat.expand(paths, format)
      else paths // write target may not exist yet
    new GeoJsonTable(schema, files, opts, format)
  }
}

class GeoJsonTable(schema: StructType, files: Seq[String], opts: GdalOptions,
    format: FeatureFormat)
  extends FeatureTable("geojson", schema, files, opts, format) with SupportsWrite {

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GeoJsonWriteBuilder(info)
}
