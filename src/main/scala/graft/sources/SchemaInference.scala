package graft.sources

import scala.collection.mutable
import org.apache.spark.sql.types._

/** A feature as produced by a format parser: optional FID, geometry as WKB
  * (null when absent/empty — reference src/lib.rs:386-388), and named
  * property values in document order. Values are one of: null, Int, Long,
  * Double, Boolean, String, java.sql.Date, java.sql.Timestamp,
  * Seq[Int|Long|Double|String]. */
final case class RawFeature(
    fid: Long,
    geomWkb: Array[Byte],
    props: IndexedSeq[(String, Any)])

/** Schema inference over a feature stream, per SURVEY.md §1.4 (reference
  * src/lib.rs:332-485):
  *   1. first occurrence of a field creates its column, typed from the
  *      first observed non-null value;
  *   2-3. missing/late fields are nullable with null backfill (all our
  *      data columns are nullable, which subsumes the lazy flag);
  *   4. all-null columns are dropped;
  *   5. collisions with the geometry/FID column name are renamed
  *      `{name}_original` (rename wins over the reference's dead error
  *      variants, src/error.rs:32-38);
  *   6. column order is FIRST-SEEN order (deterministic — an improvement
  *      over the reference's HashMap order, src/lib.rs:474), FID first,
  *      geometry last.
  * Numeric widening Int→Long→Double (and anything mixed → String) is our
  * improvement for schemaless JSON; GDAL layers are uniformly typed so the
  * reference never faces it.
  */
object SchemaInference {

  private def typeOf(v: Any): DataType = v match {
    case null => NullType
    case _: Int => IntegerType
    case _: Long => LongType
    case _: Double => DoubleType
    case _: Boolean => BooleanType
    case _: String => StringType
    case _: java.sql.Date => DateType
    case _: java.sql.Timestamp => TimestampType
    case _: Array[Byte] => BinaryType // non-geometry blob columns (SpatiaLite)
    case s: Seq[_] =>
      val elem = s.collectFirst { case e if e != null => typeOf(e) }.getOrElse(NullType)
      ArrayType(if (elem == NullType) StringType else elem)
    case _ => StringType
  }

  private def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (IntegerType, LongType) | (LongType, IntegerType) => LongType
    case (IntegerType, DoubleType) | (DoubleType, IntegerType) => DoubleType
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (ArrayType(x, _), ArrayType(y, _)) => ArrayType(widen(x, y))
    case _ => StringType
  }

  def infer(features: Iterator[RawFeature], opts: GdalOptions): StructType = {
    val order = mutable.ArrayBuffer[String]()
    val types = mutable.HashMap[String, DataType]()
    var n = 0L
    while (features.hasNext && n < opts.inferLimit) {
      val f = features.next()
      for ((name, value) <- f.props) {
        if (!types.contains(name)) order += name
        val t = typeOf(value)
        types(name) = types.get(name).map(widen(_, t)).getOrElse(t)
      }
      n += 1
    }
    val geomName = opts.geometryColumnName
    val reserved = Set(geomName) ++ opts.fidColumnName
    val dataFields = order.toSeq
      .filter(name => types(name) != NullType) // rule 4: all-null dropped
      .map { name =>
        val out = if (reserved.contains(name)) s"${name}_original" else name // rule 5
        StructField(out, types(name), nullable = true)
      }
    val geomType = if (opts.geometryFormat == "wkb") BinaryType else StringType
    val fidField = opts.fidColumnName.map(StructField(_, LongType, nullable = true)).toSeq
    StructType(fidField ++ dataFields :+ StructField(geomName, geomType, nullable = true))
  }
}
