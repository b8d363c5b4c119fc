package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
  /** Mixed float-left / double-right dot — float→double cast is exact, so
    * this equals DuckDB's list_dot_product(CAST(a AS DOUBLE[]), b). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements, b.numElements)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  /** Nearest centroid by squared L2 expressed as ccs(c) − 2·(v·c) (the
    * per-row ‖v‖² term is constant across centroids, so it never affects
    * the argmin). The score is built from the SAME left-to-right dot the
    * oracle's list_dot_product computes, so a DuckDB cross-join +
    * row_number twin reproduces the assignment bit-for-bit — which a
    * (v_i−c_i)² accumulation (IvfAssign's shape) cannot promise, because
    * no DuckDB builtin shares that summation tree. Ties break to the
    * lowest centroid id. */
  def kmeansAssign(v: ArrayData, centroids: Array[Array[Double]],
      ccs: Array[Double], isFloat: Boolean): Int = {
    var best = -1
    var bestScore = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      val n = math.min(v.numElements, ctr.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) * ctr(i)
        i += 1
      }
      val score = ccs(c) - 2.0 * dot
      if (score < bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }
}

/** LSH / IVF bucketing kernels for embedding similarity. */
object VecLshKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Deterministic gaussian hyperplanes for sign-bit LSH, cached per
    * (seed, dim, bands, bits). Each plane is seeded independently so the
    * family is stable under dim/bands changes. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Int), Array[Array[Double]]]()

  private def planes(seed: Int, dim: Int, bands: Int, bits: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((seed, dim, bands, bits), _ =>
      Array.tabulate(bands * bits) { p =>
        val rnd = new scala.util.Random(seed.toLong * 1000003L + p)
        Array.fill(dim)(rnd.nextGaussian())
      })

  def toDouble(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** The `bands` sign-bit LSH band keys of a vector: band b's key packs
    * the band index (high 32 bits) with `bits` hyperplane sign bits, so
    * keys from different bands never collide in an equality join. */
  def lshBands(v: ArrayData, bands: Int, bits: Int, seed: Int, isFloat: Boolean): ArrayData = {
    val dim = v.numElements()
    if (dim == 0) return new GenericArrayData(Array.empty[Any])
    val pl = planes(seed, dim, bands, bits)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < bits) {
        val p = pl(b * bits + r)
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += toDouble(v, i, isFloat) * p(i); i += 1 }
        if (dot > 0) key |= (1L << r)
        r += 1
      }
      out(b) = (b.toLong << 32) | key
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Indices of the `n` nearest centroids by L2, ties by index. */
  def nearestCentroids(v: ArrayData, centroids: Array[Array[Double]], n: Int,
      isFloat: Boolean): Array[Int] = {
    val dim = v.numElements()
    val dists = centroids.indices.map { c =>
      val ctr = centroids(c)
      var d = 0.0
      var j = 0
      while (j < dim && j < ctr.length) {
        val t = toDouble(v, j, isFloat) - ctr(j); d += t * t; j += 1
      }
      (d, c)
    }
    dists.sortBy(identity).take(n).map(_._2).toArray
  }

  def ivfAssign(v: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Int =
    nearestCentroids(v, centroids, 1, isFloat)(0)

  def ivfProbe(v: ArrayData, centroids: Array[Array[Double]], nprobe: Int,
      isFloat: Boolean): ArrayData =
    new GenericArrayData(nearestCentroids(v, centroids, nprobe, isFloat)
      .map(_.asInstanceOf[Any]))
}

/** cosine_lsh_bands(v, bands, bits, seed) → array<long> of band keys. */
case class CosineLshBands(child: Expression, bands: Int, bits: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cosine_lsh_bands"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any): Any =
    VecLshKernels.lshBands(a.asInstanceOf[ArrayData], bands, bits, seed, isFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecLshKernels.lshBands($a, $bands, $bits, $seed, $isFloat)")

  protected override def withNewChildInternal(c: Expression): CosineLshBands =
    copy(child = c)
}

/** ivf_assign: nearest coarse-centroid id of a vector (codegen'd; the
  * centroid table rides along as a plan reference object, not a UDF
  * closure — no per-row boxing of the input array). */
case class IvfAssign(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any): Any =
    VecLshKernels.ivfAssign(a.asInstanceOf[ArrayData], centroids, isFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecLshKernels.ivfAssign($a, $ref, $isFloat)")
  }

  protected override def withNewChildInternal(c: Expression): IvfAssign =
    copy(child = c)
}

/** kmeans_assign: nearest-centroid id via the oracle-replicable
  * ccs(c) − 2·(v·c) score (see VecKernels.kmeansAssign). Centroids ride
  * the plan as codegen reference objects — the assignment is a pure
  * per-row projection: no join, no shuffle, exactly how a 100 TB Lloyd
  * iteration must be shaped (only the k×dim update aggregate shuffles). */
case class KmeansAssign(child: Expression, centroids: Array[Array[Double]],
    ccs: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "kmeans_assign"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any): Any =
    VecKernels.kmeansAssign(a.asInstanceOf[ArrayData], centroids, ccs, isFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refC = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val refS = ctx.addReferenceObj("ccs", ccs, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecKernels.kmeansAssign($a, $refC, $refS, $isFloat)")
  }

  protected override def withNewChildInternal(c: Expression): KmeansAssign =
    copy(child = c)
}

/** ivf_probe: the nprobe nearest coarse-centroid ids (see IvfAssign). */
case class IvfProbe(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any): Any =
    VecLshKernels.ivfProbe(a.asInstanceOf[ArrayData], centroids, nprobe, isFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecLshKernels.ivfProbe($a, $ref, $nprobe, $isFloat)")
  }

  protected override def withNewChildInternal(c: Expression): IvfProbe =
    copy(child = c)
}

/** Product-quantization kernels: codebooks[m][k][subDim] trained
  * driver-side (bounded sample), encode/score map-side. */
object PqKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Nearest codebook entry per subspace → M small codes. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]], isFloat: Boolean): ArrayData = {
    val m = cb.length
    val sub = cb(0)(0).length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb(s).length) {
        var d = 0.0
        var j = 0
        while (j < sub) {
          val idx = s * sub + j
          val x = if (idx < v.numElements())
            VecLshKernels.toDouble(v, idx, isFloat) else 0.0
          val t = x - cb(s)(k)(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate dot(query, decode(codes)) without the original vector. */
  def dot(codes: ArrayData, q: ArrayData, cb: Array[Array[Array[Double]]],
      qIsFloat: Boolean): Double = {
    val m = cb.length
    val sub = cb(0)(0).length
    var acc = 0.0
    var s = 0
    while (s < m) {
      val ctr = cb(s)(codes.getInt(s))
      var j = 0
      while (j < sub) {
        val idx = s * sub + j
        if (idx < q.numElements())
          acc += VecLshKernels.toDouble(q, idx, qIsFloat) * ctr(j)
        j += 1
      }
      s += 1
    }
    acc
  }
}

/** pq_encode: vector → M subspace codes (plan-reference codebooks). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any): Any =
    PqKernels.encode(a.asInstanceOf[ArrayData], codebooks, isFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.PqKernels.encode($a, $ref, $isFloat)")
  }

  protected override def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** pq_dot(codes, query): approximate dot product from codes alone. */
case class PqDot(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_dot"

  private lazy val qIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], codebooks, qIsFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqKernels.dot($a, $b, $ref, $qIsFloat)")
  }

  protected override def withNewChildrenInternal(l: Expression, r: Expression): PqDot =
    copy(left = l, right = r)
}

/** vec_dot(a, b): double dot product of two float or double arrays. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val kernel = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => "dotF"
    case (ArrayType(FloatType, _), _) => "dotFD"
    case (_, ArrayType(FloatType, _)) => "dotDF"
    case _ => "dotD"
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dotF" => VecKernels.dotF(x, y)
      case "dotFD" => VecKernels.dotFD(x, y)
      case "dotDF" => VecKernels.dotDF(x, y)
      case _ => VecKernels.dotD(x, y)
    }
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.$kernel($a, $b)")

  protected override def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Hilbert-curve kernels: the locality-preserving space-filling index
  * that completes the layout family next to the Morton/Z code
  * (Graft.mortonZ). Unlike Z-order, the Hilbert curve never jumps —
  * curve-consecutive cells are always grid-adjacent — so range
  * partitioning by it yields tighter per-file bounding boxes (measured
  * by q219's bucket-bbox audit). */
object HilbertKernels {
  /** Classic rotate-flip xy2d over a 2^order × 2^order grid: walk the
    * bit planes top-down, add the quadrant's sub-square count, rotate
    * the frame so every sub-square is traversed corner-to-corner.
    * Coordinates are taken mod 2^order (masked), so any long is safe. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << order) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate (and flip when rx=1) the lower quadrant
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** hilbert_index(x, y, order) — codegen'd Hilbert curve index of two
  * integer coordinates on the 2^order grid (order a literal, 1..31).
  * Interpreted eval widens any boxed integral input (the SQL builder
  * also inserts LongType casts) — a bare asInstanceOf[Long] would CCE
  * on INT literals under ConstantFolding (review finding); codegen is
  * safe either way because Java widens int→long at the call site. */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31,
    s"hilbert_index order must be in [1, 31], got $order")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernels.xy2d(order, a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertKernels.xy2d($order, $a, $b)")

  protected override def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
}
