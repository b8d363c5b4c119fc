package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector kernels as native codegen'd expressions. The higher-order
  * `aggregate(zip_with(...))` formulation is interpreted per element and
  * collapses under all-pairs workloads (59s for 2M pairs at sf0.1); this
  * static-loop kernel is the "custom Expression beats UDF beats HOF"
  * preference order from SURVEY.md made concrete.
  *
  * Accumulation is sequential left-to-right in double precision — the same
  * summation order as the HOF form and DuckDB's list_dot_product over
  * DOUBLE[], so oracle-checked results are unchanged.
  */
object VecKernels {
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements, b.numElements)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements, b.numElements)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** vec_dot(a, b): double dot product of two float or double arrays. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val kernel = left.dataType match {
    case ArrayType(FloatType, _) => "dotF"
    case _ => "dotD"
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (kernel == "dotF") VecKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VecKernels.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.$kernel($a, $b)")

  protected override def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}
