package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the query corpus.
  *
  * Cross-engine exactness policy (Spark result must hash-match the DuckDB
  * oracle on the same parquet inputs):
  *   - Sums of "money"/quantity doubles are cast to DECIMAL before SUM and
  *     the (exact) decimal total is cast back to DOUBLE. Decimal addition is
  *     associative, so partial/map-side aggregation order cannot change the
  *     result — this is also the right call at 100 TB, where float sums are
  *     nondeterministic run-to-run under shuffle.
  *   - Averages are expressed as decimal-sum → double, divided by COUNT in
  *     a single double division (decimal division scales differ per engine).
  *   - Ratio thresholds (e.g. Jaccard >= 0.8) use integer cross-multiplied
  *     arithmetic (5*inter >= 4*union), never float comparison.
  *   - Every computed integer column is cast to LongType to match DuckDB's
  *     BIGINT defaults; HUGEINT-producing forms (SUM over int) are avoided.
  *   - Output is totally ordered by key columns so row order is identical.
  */
private[graft] object Util {
  type Q = (SparkSession, String) => DataFrame

  /** Load a driver-generated table from the given scale-factor dir.
    *
    * `events.ts` has shipped in two physical layouts across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as a long under legacy nanosAsLong and floor-divided
    * to µs, matching DuckDB's ns→µs cast) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark reads as TIMESTAMP_NTZ).
    * Normalize both to a session-TZ TIMESTAMP so every downstream query
    * sees one type; with the UTC session zone this cast is
    * value-preserving, so results are identical across generations.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal cast of a double column (scale matches data generation). */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Order-insensitive exact sum of a double column via decimal. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average: decimal sum as double over count (one double division). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(lit(1))
}
