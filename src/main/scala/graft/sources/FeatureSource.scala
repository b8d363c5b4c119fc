package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Generic DSv2 wiring shared by all feature formats (SURVEY.md §3.1's
  * Spark lifecycle: inferSchema on the driver → ScanBuilder with pushdown →
  * one InputPartition per file → executor-side PartitionReader running the
  * reference's read loop against the fixed schema).
  *
  * Scale notes: partition granularity is per-file — directories of many
  * files parallelize across executors. Column pruning and filter evaluation
  * happen inside the reader (before row materialization), and pushed limits
  * stop the file stream early.
  */
abstract class FeatureSourceProvider extends TableProvider with DataSourceRegister {
  def format: FeatureFormat

  override def supportsExternalMetadata(): Boolean = true

  protected def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { js =>
      // "paths" arrives as a JSON array of strings
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
      (0 until node.size).map(node.get(_).asText)
    }
    val all = single ++ multi
    if (all.isEmpty) throw new IllegalArgumentException(s"$shortName source requires a path")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = GdalOptions(options)
    val files = FeatureFormat.expand(pathsOf(options), format)
    val its = files.map(f => format.open(f, opts))
    try SchemaInference.infer(its.iterator.flatMap(it => FeatureFormat.window(it, opts)), opts)
    finally its.foreach(it => try it.close() catch { case _: Throwable => () })
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = GdalOptions.from(properties.asScala.toMap)
    val files = FeatureFormat.expand(
      pathsOf(new CaseInsensitiveStringMap(properties)), format)
    new FeatureTable(shortName, schema, files, opts, format)
  }
}

/** Base for providers whose tables also support writes. Resolves BOTH the
  * single `path` and the multi-path `paths` read forms (DataFrameReader
  * `.load(a, b, …)` arrives as a `paths` JSON array, not `path`) while
  * tolerating not-yet-existing write targets. Formats only supply their
  * table constructor — the previous per-format copies of this logic had
  * each regressed to `path`-only, silently planning zero files for
  * multi-path loads. */
abstract class WritableFeatureSourceProvider extends FeatureSourceProvider {
  protected def newTable(schema: StructType, files: Seq[String], opts: GdalOptions): Table

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val cis = new CaseInsensitiveStringMap(properties)
    val files = pathsOf(cis).flatMap { p =>
      if (new java.io.File(FeatureFormat.stripScheme(p)).exists())
        FeatureFormat.expand(Seq(p), format)
      else Seq(p) // write target may not exist yet
    }
    newTable(schema, files, GdalOptions(cis))
  }
}

class FeatureTable(
    source: String,
    tableSchema: StructType,
    files: Seq[String],
    opts: GdalOptions,
    format: FeatureFormat) extends Table with SupportsRead {

  override def name(): String = s"$source(${files.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FeatureScanBuilder(tableSchema, files, GdalOptions(options), format)
}

class FeatureScanBuilder(
    fullSchema: StructType,
    files: Seq[String],
    opts: GdalOptions,
    format: FeatureFormat)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters with SupportsPushDownLimit {

  private var readSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep full-schema field order for determinism
    val names = requiredSchema.fieldNames.toSet
    readSchema = StructType(fullSchema.fields.filter(f => names.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FilterEval.supported)
    filters // all stay residual: we prune early but never claim exclusivity
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = Some(l); false /* keep plan limit too */ }

  override def build(): Scan = new FeatureScan(readSchema, files, opts, format, pushed, limit)
}

case class FeaturePartition(split: SplitSpec, index: Int) extends InputPartition

class FeatureScan(
    schema: StructType,
    files: Seq[String],
    opts: GdalOptions,
    format: FeatureFormat,
    filters: Array[Filter],
    limit: Option[Int]) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft ${format.getClass.getSimpleName} files=${files.size} " +
      s"PushedFilters=[${filters.mkString(", ")}] limit=$limit" +
      opts.bbox.fold("")(b => s" bbox=[${b.minX},${b.minY},${b.maxX},${b.maxY}]")

  override def planInputPartitions(): Array[InputPartition] = {
    // Record-range splitting only applies when the scan-window options are
    // unset: offset/limit/maxFeatures are per-resource semantics
    // (reference src/lib.rs:360-375) and must see the whole stream.
    val windowed = opts.offset > 0 || opts.limit.isDefined || opts.maxFeatures.isDefined
    val splits =
      if (windowed) files.map(SplitSpec(_, 0L, -1L))
      else files.flatMap(f => format.planSplits(f, opts))
    splits.zipWithIndex.map { case (sp, i) => FeaturePartition(sp, i) }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FeatureReaderFactory(schema, opts, format, filters, limit)
}

class FeatureReaderFactory(
    schema: StructType,
    opts: GdalOptions,
    format: FeatureFormat,
    filters: Array[Filter],
    limit: Option[Int]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[FeaturePartition].split
    new FeaturePartitionReader(split, schema, opts, format, filters, limit)
  }
}

class FeaturePartitionReader(
    split: SplitSpec,
    schema: StructType,
    opts: GdalOptions,
    format: FeatureFormat,
    filters: Array[Filter],
    limit: Option[Int]) extends PartitionReader[InternalRow] {

  private val converter = new RowConverter(schema, opts)
  private val underlying = format.openSplit(split, opts)
  // The bbox contract holds on EVERY format: formats with a native index
  // (FGB R-tree, shapefile boxes) enforce it in their own readers and
  // declare handlesBbox, so they skip this re-check (it would decode WKB
  // per row just to re-test an envelope the index already tested) —
  // index-less formats (geojson, csvgeo, kml, …) get the filter enforced
  // here instead of silently ignoring the option. Applied BEFORE
  // windowing: GDAL sets the spatial filter on the layer, so
  // offset/limit/maxFeatures count filtered features (reference
  // src/lib.rs:316-319 + 360-375 composition). Features without geometry
  // never match a spatial filter.
  private val boxed = opts.bbox match {
    case None => underlying
    case Some(_) if format.handlesBbox => underlying
    case Some(q) => underlying.filter { f =>
      f.geomWkb != null && {
        val e = graft.geom.GeomCodec.fromWkb(f.geomWkb).getEnvelopeInternal
        q.intersects(graft.sources.flatgeobuf.FgbIndex.Box(
          e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))
      }
    }
  }
  private val windowed = FeatureFormat.window(boxed, opts)
  private val schemaNames = schema.fieldNames.toSet
  private val filtered =
    if (filters.isEmpty) windowed
    else windowed.filter { f =>
      def get(name: String): Option[Any] =
        if (opts.fidColumnName.contains(name)) Some(f.fid)
        // the geometry column lives on the feature, not in props — without
        // this arm it resolved through the absent-field rule to Some(null)
        // and IsNotNull(geometry) pruned EVERY row
        else if (name == opts.geometryColumnName) Some(f.geomWkb)
        else f.props.collectFirst { case (n, v) if n == name => v } match {
          case some @ Some(_) => some
          case None if schemaNames.contains(name) => Some(null) // absent field = null
          case None => None // unknown column: keep row, residual decides
        }
      filters.forall(FilterEval.eval(_, get))
    }
  private val capped = limit.map(filtered.take).getOrElse(filtered)

  private var current: InternalRow = _

  override def next(): Boolean =
    if (capped.hasNext) { current = converter.convert(capped.next()); true } else false

  override def get(): InternalRow = current
  override def close(): Unit = underlying.close()
}
