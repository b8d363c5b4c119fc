package graft.sources.geoparquet

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetWriter}
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoParquet read/write — the cloud-native geo format (GDAL's
  * "(Geo)Parquet" driver family; public spec
  * github.com/opengeospatial/geoparquet, v1.1.0): plain parquet files
  * whose footer key-value metadata carries a `geo` JSON document naming
  * the primary geometry column (WKB-encoded), its geometry types, and
  * its bbox.
  *
  * This is the one geo format where the 100 TB story is entirely Spark's
  * own: data files are ordinary parquet, so the READ path is
  * `spark.read.parquet` — vectorized, splittable, predicate/projection
  * pushdown, partition pruning, all for free — plus a driver-side footer
  * parse for the geo metadata. The WRITE path runs one parquet-mr writer
  * per partition (the same per-partition `part-NNNNN` contract as the
  * FGB/GeoJSON DSv2 writers) and stamps every file's footer with the
  * `geo` document. Reference context: the GDAL bridge reads such
  * datasets via `df_from_resource` (ref src/lib.rs:240-247); here the
  * format is native rather than delegated.
  */
object GeoParquet {

  /** Parsed `geo` footer metadata (subset this engine writes/needs).
    * `covering` maps xmin/ymin/xmax/ymax → column path (spec v1.1
    * covering section), when the dataset declares one. */
  case class GeoMeta(primaryColumn: String, encoding: String,
      geometryTypes: Seq[String], bbox: Option[Seq[Double]],
      covering: Map[String, Seq[String]] = Map.empty)

  // ------------------------------------------------------------- write

  /** Distributed GeoParquet write: one parquet file per partition, each
    * footer carrying the `geo` metadata. `stats = true` (default) runs one
    * aggregate pass for the dataset bbox + distinct geometry types —
    * partial+final agg over codegen'd st_xmin/st_ymin/st_xmax/st_ymax,
    * a bounded 4-double + type-list result.
    *
    * `bboxColumn = true` additionally materializes the spec v1.1
    * "covering" bbox: a per-row `bbox {xmin,ymin,xmax,ymax}` struct whose
    * leaves are plain doubles — the thing parquet min/max row-group stats
    * CAN prune on (WKB binary can't), declared in the `geo` document's
    * `covering` section so spec-aware readers find it. This is how a
    * 100 TB GeoParquet lake serves spatial filters: bbox predicate →
    * row-group skip, exact geometry test only on survivors (see
    * [[read]]). */
  /** `filePrefix`/`overwrite` make the writer micro-batch-friendly: a
    * streaming foreachBatch sink passes `filePrefix = s"batch-$batchId"`,
    * `overwrite = false` — batch retries rewrite the SAME file names
    * (idempotent, exactly-once at the file level) while other batches'
    * files are left alone. */
  def write(df: DataFrame, path: String, geometryCol: String = "geometry",
      stats: Boolean = true, bboxColumn: Boolean = false,
      filePrefix: String = "part", overwrite: Boolean = true): Unit = {
    require(df.schema.fieldNames.contains(geometryCol),
      s"geometry column '$geometryCol' not in schema")
    require(df.schema(geometryCol).dataType == BinaryType,
      s"geometry column '$geometryCol' must be WKB binary")
    graft.functions.GraftFunctions.register(df.sparkSession)

    val out = if (!bboxColumn) df else df.withColumn("bbox", when(
      col(geometryCol).isNotNull,
      struct(
        expr(s"st_xmin(`$geometryCol`)").as("xmin"),
        expr(s"st_ymin(`$geometryCol`)").as("ymin"),
        expr(s"st_xmax(`$geometryCol`)").as("xmax"),
        expr(s"st_ymax(`$geometryCol`)").as("ymax"))))
    val schema = out.schema
    val geoJson = buildGeoJson(df, geometryCol, stats, bboxColumn)
    val msg = messageType(schema)
    val confSer = new SerializableWriterConf(schema, msg.toString, geoJson)

    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) fs.mkdirs(dir)

    // Overwrite is WRITE-THEN-SWAP with a commit-protocol shape: tasks
    // land in attempt-isolated .tmp files and COMMIT (rename) to a stable
    // per-partition tmp name on task success, so a speculative/retried
    // task never races a committed file; the job-level swap then renames
    // the previous dataset ASIDE (.old-), renames the new files in, and
    // only deletes the old files once every rename succeeded — a crash
    // mid-swap leaves the previous dataset recoverable under .old- names,
    // never silently lost. Every fs.rename result is checked and fails
    // loudly. Append mode (streaming batches) writes stable final names
    // directly — idempotent per batch, other batches untouched.
    val writePrefix = if (overwrite) s".tmp-$filePrefix" else filePrefix
    if (overwrite)
      fs.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.startsWith(".tmp-") || p.getName.startsWith(".old-"))
        .foreach(fs.delete(_, false))

    val committedPids = df.sparkSession.sparkContext
      .collectionAccumulator[Int]("geoparquetCommittedPids")
    out.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val file = new Path(path, f"$writePrefix%s-$pid%05d.parquet")
        if (overwrite) {
          // task-attempt isolation: write under the attempt id, rename to
          // the partition name on success (last committer wins). Rename
          // FIRST — on POSIX the rename overwrites atomically, so there
          // is no instant where the committed name is absent; only a
          // failed rename (filesystem refuses to clobber) falls back to
          // delete-then-retry. A zombie attempt killed inside that
          // fallback window is caught by the job-commit existence check
          // below, which fails the job instead of silently promoting a
          // dataset missing this partition.
          val attempt = new Path(path, f"$writePrefix%s-$pid%05d-a${tc.taskAttemptId()}%s.parquet")
          val pfs = attempt.getFileSystem(new Configuration())
          val writer = confSer.openWriter(attempt)
          try it.foreach(writer.write) finally writer.close()
          if (!pfs.rename(attempt, file)) {
            pfs.delete(file, false)
            if (!pfs.rename(attempt, file))
              throw new java.io.IOException(s"geoparquet: task commit rename failed: $attempt -> $file")
          }
          committedPids.add(pid)
        } else {
          val writer = confSer.openWriter(file)
          try it.foreach(writer.write) finally writer.close()
        }
      }
    }

    if (overwrite) {
      // job-commit verification: every partition some attempt reported as
      // committed must still be on disk under its committed name — closes
      // the delete/rename race where a killed retry removed the winner
      val missing = committedPids.value.asScala.toSet.filter { pid =>
        !fs.exists(new Path(path, f"$writePrefix%s-$pid%05d.parquet"))
      }
      if (missing.nonEmpty)
        throw new java.io.IOException(
          s"geoparquet: committed files missing for partitions ${missing.toSeq.sorted.mkString(",")} " +
          "(task-commit race or external deletion); previous dataset left untouched")
    }

    if (overwrite) {
      def renameOrFail(from: Path, to: Path): Unit =
        if (!fs.rename(from, to))
          throw new java.io.IOException(s"geoparquet: rename failed: $from -> $to (previous dataset preserved under .old- files)")
      // ONLY task-committed files swap in: the exact .tmp-<prefix>-NNNNN
      // name, never a leftover .tmp-<prefix>-NNNNN-aN attempt file from a
      // failed/superseded attempt (partial rows or a footer-less file
      // must not be promoted into the dataset)
      val committedName = s"\\.tmp-${java.util.regex.Pattern.quote(filePrefix)}-\\d+\\.parquet".r
      val allTmp = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith(s".tmp-$filePrefix"))
      val (tmps, staleAttempts) =
        allTmp.partition(p => committedName.matches(p.getName))
      staleAttempts.foreach(fs.delete(_, false))
      val olds = fs.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !p.getName.startsWith(".tmp-") && !p.getName.startsWith(".old-"))
      // step 1: old dataset aside (still on disk, recoverable)
      val asides = olds.map { p =>
        val aside = new Path(dir, s".old-${p.getName}")
        renameOrFail(p, aside); aside
      }
      // step 2: new files in
      if (tmps.isEmpty) {
        // empty input still yields a readable (schema-only) dataset
        // rather than bricking the path
        val w = confSer.openWriter(new Path(path, s"$filePrefix-00000.parquet"))
        w.close()
      } else tmps.foreach { t =>
        renameOrFail(t, new Path(dir, t.getName.stripPrefix(".tmp-")))
      }
      // step 3: only now is the old dataset gone
      asides.foreach(fs.delete(_, false))
    }
  }

  /** The `geo` footer document (spec v1.1.0). */
  private def buildGeoJson(df: DataFrame, geometryCol: String,
      stats: Boolean, bboxColumn: Boolean = false): String = {
    val (types, bbox) =
      if (!stats) (Seq.empty[String], None)
      else {
        val r = df.filter(col(geometryCol).isNotNull)
          .agg(
            sort_array(collect_set(expr(s"st_geometrytype(`$geometryCol`)"))).as("t"),
            min(expr(s"st_xmin(`$geometryCol`)")).as("x0"),
            min(expr(s"st_ymin(`$geometryCol`)")).as("y0"),
            max(expr(s"st_xmax(`$geometryCol`)")).as("x1"),
            max(expr(s"st_ymax(`$geometryCol`)")).as("y1"))
          .head()
        if (r.isNullAt(1)) (r.getSeq[String](0), None)
        else (r.getSeq[String](0),
          Some(Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      }
    // serialized with Jackson (not string interpolation) so a geometry
    // column name containing quotes/backslashes still yields valid JSON
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.1.0")
    root.put("primary_column", geometryCol)
    val colNode = root.putObject("columns").putObject(geometryCol)
    colNode.put("encoding", "WKB")
    val tArr = colNode.putArray("geometry_types")
    types.foreach(t => tArr.add(wkbTypeName(t)))
    bbox.foreach { b =>
      val bArr = colNode.putArray("bbox"); b.foreach(bArr.add)
    }
    if (bboxColumn) {
      val cov = colNode.putObject("covering").putObject("bbox")
      Seq("xmin", "ymin", "xmax", "ymax").foreach { leaf =>
        val p = cov.putArray(leaf); p.add("bbox"); p.add(leaf)
      }
    }
    mapper.writeValueAsString(root)
  }

  /** JTS type names → GeoParquet spec names (identical modulo case). */
  private def wkbTypeName(jts: String): String = jts match {
    case "LinearRing" => "LineString"
    case other => other
  }

  // -------------------------------------------------------------- read

  /** Read a GeoParquet dataset through Spark's native parquet scan. The
    * geometry column arrives as WKB binary exactly as the convention
    * expects; all parquet goodness (column pruning, filter pushdown,
    * splits) applies untouched. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bbox-filtered read over a dataset written with `bboxColumn = true`:
    * the covering-struct predicate is an ordinary comparison on double
    * leaves, so Spark pushes it into the parquet scan (nested-field
    * pushdown) and row groups whose bbox min/max stats miss the query box
    * are skipped WITHOUT decoding — the native-index analog of the
    * FlatGeobuf R-tree split planning, on the format built for 100 TB.
    * The exact `st_intersects_bbox` test stays as the residual (envelope
    * semantics, same contract as the DSv2 `bbox` option). */
  def read(spark: SparkSession, path: String,
      bbox: (Double, Double, Double, Double)): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (x0, y0, x1, y1) = bbox
    val df = spark.read.parquet(path)
    val m = meta(spark, path) // one driver-side footer open, reused below
    val geom = m.map(_.primaryColumn).getOrElse("geometry")
    // pruning predicate comes from the DECLARED covering paths (spec
    // v1.1) — other writers may name the column differently, and a
    // dataset without (or with an incompatible) covering simply keeps
    // the exact residual alone (correct, just unpruned)
    val cov = m.map(_.covering).getOrElse(Map.empty)
    def covCol(leaf: String): Option[org.apache.spark.sql.Column] =
      cov.get(leaf).filter(_.nonEmpty).flatMap { p =>
        scala.util.Try(p.tail.foldLeft(col(p.head))(_.getField(_))).toOption
      }
    val pruned = (covCol("xmin"), covCol("ymin"), covCol("xmax"), covCol("ymax")) match {
      case (Some(cx0), Some(cy0), Some(cx1), Some(cy1)) =>
        scala.util.Try(
          df.filter(cx0 <= x1 && cx1 >= x0 && cy0 <= y1 && cy1 >= y0)
        ).getOrElse(df)
      case _ => df
    }
    pruned.filter(expr(s"st_intersects_bbox(`$geom`, $x0, $y0, $x1, $y1)"))
  }

  /** The parsed `geo` footer metadata of the first parquet file under
    * `path` (driver-side footer read — no data pages touched). */
  def meta(spark: SparkSession, path: String): Option[GeoMeta] = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !p.getName.startsWith(".")).sortBy(_.getName)
        .headOption.getOrElse(return None)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, hconf))
    val geo = try {
      Option(reader.getFooter.getFileMetaData.getKeyValueMetaData.get("geo"))
    } finally reader.close()
    geo.map(parseGeoJson)
  }

  private def parseGeoJson(json: String): GeoMeta = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    val primary = m.path("primary_column").asText("geometry")
    val colNode = m.path("columns").path(primary)
    val enc = colNode.path("encoding").asText("WKB")
    val types = colNode.path("geometry_types").elements().asScala
      .map(_.asText()).toSeq
    val bbox = Option(colNode.get("bbox"))
      .map(_.elements().asScala.map(_.asDouble()).toSeq)
    val covering = Option(colNode.get("covering")).map(_.path("bbox")) match {
      case Some(b) if b.isObject =>
        Seq("xmin", "ymin", "xmax", "ymax").flatMap { leaf =>
          Option(b.get(leaf)).map(p =>
            leaf -> p.elements().asScala.map(_.asText()).toSeq)
        }.toMap
      case _ => Map.empty[String, Seq[String]]
    }
    GeoMeta(primary, enc, types, bbox, covering)
  }

  // ------------------------------------------------- parquet plumbing

  /** Spark schema → parquet MessageType (scalar + binary columns plus
    * one-level scalar structs, e.g. the covering bbox — the geo table
    * surface; other nested types are rejected loudly). */
  private[geoparquet] def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case st: StructType =>
          val g = Types.optionalGroup()
          st.fields.foreach(sf => g.addField(primitive(sf).named(sf.name)))
          b.addField(g.named(f.name))
        case _ => b.addField(primitive(f).named(f.name))
      }
    }
    b.named("graft_geoparquet")
  }

  private def primitive(f: StructField): Types.Builder[_, _ <: org.apache.parquet.schema.Type] = {
      val t = f.dataType match {
        case IntegerType => Types.optional(INT32)
        case LongType => Types.optional(INT64)
        case FloatType => Types.optional(FLOAT)
        case DoubleType => Types.optional(DOUBLE)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(BINARY)
        case DateType =>
          Types.optional(INT32).as(LogicalTypeAnnotation.dateType())
        case TimestampNTZType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new IllegalArgumentException(
          s"geoparquet writer: unsupported column type $other (${f.name})")
      }
      t
  }
}

/** Serializable bundle shipping the writer config to executors; opens a
  * parquet-mr writer whose footer carries the `geo` document. */
private[geoparquet] class SerializableWriterConf(schema: StructType,
    msgString: String, geoJson: String) extends Serializable {

  def openWriter(file: Path): ParquetWriter[Row] = {
    val msg = org.apache.parquet.schema.MessageTypeParser.parseMessageType(msgString)
    new RowParquetBuilder(file, msg, schema, geoJson)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      // task retries / idempotent streaming batches rewrite the same name
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .build()
  }
}

private[geoparquet] class RowParquetBuilder(file: Path, msg: MessageType,
    schema: StructType, geoJson: String)
  extends ParquetWriter.Builder[Row, RowParquetBuilder](file) {
  override def self(): RowParquetBuilder = this
  override def getWriteSupport(conf: Configuration): WriteSupport[Row] =
    new RowWriteSupport(msg, schema, geoJson)
}

/** Minimal Row WriteSupport: scalar/binary fields, nulls by omission
  * (optional fields), `geo` JSON in the footer key-value metadata. */
private[geoparquet] class RowWriteSupport(msg: MessageType,
    schema: StructType, geoJson: String) extends WriteSupport[Row] {
  private var rc: RecordConsumer = _
  private val fields = schema.fields

  override def init(conf: Configuration): WriteSupport.WriteContext =
    new WriteSupport.WriteContext(msg, Map("geo" -> geoJson).asJava)

  override def prepareForWrite(consumer: RecordConsumer): Unit = rc = consumer

  override def write(row: Row): Unit = {
    rc.startMessage()
    writeFields(row, fields)
    rc.endMessage()
  }

  private def writeFields(row: Row, fs: Array[StructField]): Unit = {
    var i = 0
    while (i < fs.length) {
      if (!row.isNullAt(i)) {
        val f = fs(i)
        rc.startField(f.name, i)
        f.dataType match {
          case st: StructType =>
            rc.startGroup()
            writeFields(row.getStruct(i), st.fields)
            rc.endGroup()
          case IntegerType => rc.addInteger(row.getInt(i))
          case LongType => rc.addLong(row.getLong(i))
          case FloatType => rc.addFloat(row.getFloat(i))
          case DoubleType => rc.addDouble(row.getDouble(i))
          case BooleanType => rc.addBoolean(row.getBoolean(i))
          case StringType => rc.addBinary(Binary.fromString(row.getString(i)))
          case BinaryType =>
            rc.addBinary(Binary.fromConstantByteArray(row.getAs[Array[Byte]](i)))
          case DateType =>
            rc.addInteger(row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
          case TimestampNTZType =>
            val ldt = row.getAs[java.time.LocalDateTime](i)
            rc.addLong(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000L)
          case TimestampType =>
            val ts = row.getAs[java.sql.Timestamp](i)
            rc.addLong(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        rc.endField(f.name, i)
      }
      i += 1
    }
  }
}
