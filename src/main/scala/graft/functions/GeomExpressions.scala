package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expressions for the geometry codec surface (SURVEY.md
  * §2.7). All are codegen'd (doGenCode emits a static call into
  * [[GeomFns]]) so they stay inside whole-stage codegen — no UDF
  * serialization overhead in the hot path.
  */
case class StAsWkt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "st_aswkt"
  protected override def nullSafeEval(input: Any): Any =
    GeomFns.asWkt(input.asInstanceOf[Array[Byte]])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomFns.asWkt($c)")
  protected override def withNewChildInternal(newChild: Expression): StAsWkt =
    copy(child = newChild)
}

case class StAsGeoJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "st_asgeojson"
  protected override def nullSafeEval(input: Any): Any =
    GeomFns.asGeoJson(input.asInstanceOf[Array[Byte]])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomFns.asGeoJson($c)")
  protected override def withNewChildInternal(newChild: Expression): StAsGeoJson =
    copy(child = newChild)
}

case class StGeomFromWkt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromwkt"
  protected override def nullSafeEval(input: Any): Any =
    GeomFns.fromWkt(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomFns.fromWkt($c)")
  protected override def withNewChildInternal(newChild: Expression): StGeomFromWkt =
    copy(child = newChild)
}

case class StGeomFromWkb(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromwkb"
  protected override def nullSafeEval(input: Any): Any =
    GeomFns.fromWkb(input.asInstanceOf[Array[Byte]])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomFns.fromWkb($c)")
  protected override def withNewChildInternal(newChild: Expression): StGeomFromWkb =
    copy(child = newChild)
}

case class StGeomFromGeoJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromgeojson"
  protected override def nullSafeEval(input: Any): Any =
    GeomFns.fromGeoJson(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomFns.fromGeoJson($c)")
  protected override def withNewChildInternal(newChild: Expression): StGeomFromGeoJson =
    copy(child = newChild)
}

case class StPoint(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_point"
  protected override def nullSafeEval(lon: Any, lat: Any): Any =
    GeomFns.stPoint(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeomFns.stPoint($a, $b)")
  protected override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): StPoint =
    copy(left = newLeft, right = newRight)
}

case class StX(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_x"
  protected override def nullSafeEval(input: Any): Any =
    GeomFns.stX(input.asInstanceOf[Array[Byte]])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomFns.stX($c)")
  protected override def withNewChildInternal(newChild: Expression): StX = copy(child = newChild)
}

case class StY(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_y"
  protected override def nullSafeEval(input: Any): Any =
    GeomFns.stY(input.asInstanceOf[Array[Byte]])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeomFns.stY($c)")
  protected override def withNewChildInternal(newChild: Expression): StY = copy(child = newChild)
}

/** SQL + Column API surface. Call [[GraftFunctions.register]] once per
  * session (or configure `spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("st_aswkt", (e: Seq[Expression]) => StAsWkt(e.head)),
    ("st_asgeojson", (e: Seq[Expression]) => StAsGeoJson(e.head)),
    ("st_geomfromwkt", (e: Seq[Expression]) => StGeomFromWkt(e.head)),
    ("st_geomfromwkb", (e: Seq[Expression]) => StGeomFromWkb(e.head)),
    ("st_geomfromgeojson", (e: Seq[Expression]) => StGeomFromGeoJson(e.head)),
    ("st_point", (e: Seq[Expression]) => StPoint(e(0), e(1))),
    ("st_x", (e: Seq[Expression]) => StX(e.head)),
    ("st_y", (e: Seq[Expression]) => StY(e.head)),
    ("st_area", (e: Seq[Expression]) => StArea(e.head)),
    ("st_length", (e: Seq[Expression]) => StLength(e.head)),
    ("st_centroid", (e: Seq[Expression]) => StCentroid(e.head)),
    ("st_envelope", (e: Seq[Expression]) => StEnvelope(e.head)),
    ("st_geometrytype", (e: Seq[Expression]) => StGeometryType(e.head)),
    ("st_npoints", (e: Seq[Expression]) => StNPoints(e.head)),
    ("st_isvalid", (e: Seq[Expression]) => StIsValid(e.head)),
    ("st_parts", (e: Seq[Expression]) => StParts(e.head)),
    ("st_intersects", (e: Seq[Expression]) => StIntersects(e(0), e(1))),
    ("st_intersects_bbox", (e: Seq[Expression]) => {
      // SQL fractional literals eval to Spark Decimal, not java Number
      def d(x: Expression): Double = x.eval() match {
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"st_intersects_bbox bounds must be numeric literals, got $other")
      }
      StIntersectsBbox(e.head, d(e(1)), d(e(2)), d(e(3)), d(e(4)))
    }),
    ("st_contains", (e: Seq[Expression]) => StContains(e(0), e(1))),
    ("st_within", (e: Seq[Expression]) => StWithin(e(0), e(1))),
    ("st_distance", (e: Seq[Expression]) => StDistance(e(0), e(1))),
    ("st_buffer", (e: Seq[Expression]) => StBuffer(e(0), e(1))),
    ("st_xmin", (e: Seq[Expression]) => StXMin(e.head)),
    ("st_ymin", (e: Seq[Expression]) => StYMin(e.head)),
    ("st_xmax", (e: Seq[Expression]) => StXMax(e.head)),
    ("st_ymax", (e: Seq[Expression]) => StYMax(e.head)),
    ("st_convexhull", (e: Seq[Expression]) => StConvexHull(e.head)),
    ("st_simplify", (e: Seq[Expression]) => StSimplify(e(0), e(1))),
    ("st_union", (e: Seq[Expression]) => StUnion(e(0), e(1))),
    ("vec_dot", (e: Seq[Expression]) => VecDot(e(0), e(1))),
    ("hilbert_index", (e: Seq[Expression]) => HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Cast(e(0), LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(e(1), LongType),
      e(2).eval().asInstanceOf[Number].intValue())),
    ("simhash64", (e: Seq[Expression]) => SimHash64(e.head)),
    ("md5_lower64", (e: Seq[Expression]) => Md5Lower64(e.head)),
    ("shingle_set", (e: Seq[Expression]) =>
      ShingleSet(e.head, e(1).eval().asInstanceOf[Number].intValue())),
    ("minhash_bands", (e: Seq[Expression]) => MinHashBands(e.head)),
    ("array_pairs", (e: Seq[Expression]) => ArrayPairs(e.head)),
    ("text_stats", (e: Seq[Expression]) => TextStats(e.head)),
    ("char_stats", (e: Seq[Expression]) => CharStats(e.head)),
    ("nfc_normalize", (e: Seq[Expression]) => NfcNormalize(e.head)),
    ("bpe_count", (e: Seq[Expression]) => BpeCount(e.head)),
    ("char_clipped_matches", (e: Seq[Expression]) => CharClippedMatches(
      e(0), e(1), e(2).eval().asInstanceOf[Number].intValue())),
    ("token_clipped_matches", (e: Seq[Expression]) => TokenClippedMatches(
      e(0), e(1), e(2).eval().asInstanceOf[Number].intValue())),
    ("cosine_lsh_bands", (e: Seq[Expression]) => CosineLshBands(e.head,
      e(1).eval().asInstanceOf[Number].intValue(),
      e(2).eval().asInstanceOf[Number].intValue(),
      e(3).eval().asInstanceOf[Number].intValue())))

  def register(spark: SparkSession): Unit = {
    // Idempotent: operators call this defensively per query, and the
    // GraftExtensions injection usually got there first — re-registering
    // would spam "replaced a previously registered function" warnings.
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.registerFunction(
          FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.GeomExpressions", name),
          builder)
    }
    // Typed aggregate (no Expression-builder form): geometric union of a
    // group with executor-side partial merges.
    if (!reg.functionExists(FunctionIdentifier("st_union_agg")))
      spark.udf.register("st_union_agg",
        org.apache.spark.sql.functions.udaf(new StUnionAgg))
    // KMV distinct sketch (set-algebra companion to the HLL family):
    // k fixed at 128 — the sketch parameter is part of the function
    // identity so plans stay pure SQL strings.
    if (!reg.functionExists(FunctionIdentifier("kmv_agg128")))
      spark.udf.register("kmv_agg128",
        org.apache.spark.sql.functions.udaf(new KmvAgg(128)))
    // bounded map-side top-k (value desc, id asc) — k fixed in the name,
    // same registration convention as kmv_agg128
    if (!reg.functionExists(FunctionIdentifier("topk_agg3")))
      spark.udf.register("topk_agg3",
        org.apache.spark.sql.functions.udaf(new TopKPairAgg(3),
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong)))
  }

  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GeomExpressions", name), builder))
    }

  // Column-API wrappers (resolve through the registry at analysis time).
  def st_aswkt(c: Column): Column = call_function("st_aswkt", c)
  def st_asgeojson(c: Column): Column = call_function("st_asgeojson", c)
  def st_geomfromwkt(c: Column): Column = call_function("st_geomfromwkt", c)
  def st_geomfromwkb(c: Column): Column = call_function("st_geomfromwkb", c)
  def st_geomfromgeojson(c: Column): Column = call_function("st_geomfromgeojson", c)
  def st_point(lon: Column, lat: Column): Column = call_function("st_point", lon, lat)
  def st_x(c: Column): Column = call_function("st_x", c)
  def st_y(c: Column): Column = call_function("st_y", c)
  def st_geometrytype(c: Column): Column = call_function("st_geometrytype", c)
  def st_npoints(c: Column): Column = call_function("st_npoints", c)
  def st_centroid(c: Column): Column = call_function("st_centroid", c)
  def st_parts(c: Column): Column = call_function("st_parts", c)
}
