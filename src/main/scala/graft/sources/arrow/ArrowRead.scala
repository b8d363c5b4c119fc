package graft.sources.arrow

import java.io.FileInputStream
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC file reader (the reference's `cities.arrow` fixture path —
  * reference src/test.rs:123-158 reads an Arrow IPC file into a DataFrame
  * before writing it back out through GDAL). Driver-side materialization:
  * Arrow IPC files are small interchange artifacts here; large columnar
  * data belongs in parquet where Spark's vectorized reader applies. */
object ArrowRead {

  def fromFile(spark: SparkSession, path: String): DataFrame = {
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowFileReader(new FileInputStream(path).getChannel, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala.toSeq
      val sparkSchema = StructType(fields.map(f =>
        StructField(f.getName, arrowToSpark(f.getType), nullable = true)))
      val rows = ArrayBuffer[Row]()
      while (reader.loadNextBatch()) {
        val vectors = root.getFieldVectors.asScala.toSeq
        for (i <- 0 until root.getRowCount) {
          rows += Row.fromSeq(vectors.map(v => value(v, i)))
        }
      }
      spark.createDataFrame(rows.asJava, sparkSchema)
    } finally {
      reader.close()
      alloc.close()
    }
  }

  private def arrowToSpark(t: org.apache.arrow.vector.types.pojo.ArrowType): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    t match {
      case i: ArrowType.Int if i.getBitWidth <= 32 => IntegerType
      case _: ArrowType.Int => LongType
      case f: ArrowType.FloatingPoint
        if f.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE =>
        FloatType
      case _: ArrowType.FloatingPoint => DoubleType
      case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
      case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
      case _: ArrowType.Bool => BooleanType
      case other => StringType
    }
  }

  private def value(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: IntVector => x.get(i)
      case x: BigIntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i) // FloatType column
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: LargeVarCharVector => new String(x.get(i), "UTF-8")
      case x: VarBinaryVector => x.get(i)
      case x: LargeVarBinaryVector => x.get(i)
      case x: BitVector => x.get(i) == 1
      case other => other.getObject(i).toString
    }
}
