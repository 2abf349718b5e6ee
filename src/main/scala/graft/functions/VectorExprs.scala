package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd vector math over `array<float>` / `array<double>`
  * columns.
  *
  * Spark does NOT compile higher-order-function lambdas
  * (`aggregate(zip_with(...))` evaluates one boxed row at a time) — at
  * 100 TB that interpreted inner loop dominates every embedding
  * operator. These expressions emit tight primitive Java loops inside
  * whole-stage codegen: one array traversal per row for a full cosine
  * (dot + both norms fused) and one traversal per hyperplane for LSH
  * signatures, no boxing, no per-row allocation.
  *
  * Both float and double element types are read natively (embeddings
  * are stored as `array<float>`; a per-row cast to `array<double>`
  * would allocate). Null elements inside a vector are read as 0.0 —
  * embeddings have none by construction.
  */
object VectorExprs {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case other =>
      throw new IllegalArgumentException(
        s"expected array<float|double>, got $other")
  }

  /** Analysis-time type validation — SQL users (vec_dot/vec_cosine via
    * the FunctionRegistry) get an AnalysisException instead of an
    * internal-looking codegen crash. */
  private def checkVec(what: String, es: Expression*)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    es.find(e => !e.dataType.isInstanceOf[ArrayType] ||
        !(e.dataType.asInstanceOf[ArrayType].elementType == FloatType ||
          e.dataType.asInstanceOf[ArrayType].elementType == DoubleType))
      .map(e => TypeCheckResult.TypeCheckFailure(
        s"$what expects array<float|double>, got ${e.dataType}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  /** Loud length check for expressions carrying a fixed plane/centroid
    * matrix: silently truncating a mismatched vector (config drift
    * between signing runs) would quietly degrade recall/assignment. */
  def requireDim(actual: Int, expected: Int, what: String): Unit =
    if (actual != expected) throw new IllegalArgumentException(
      s"$what: vector has $actual components, expected $expected — " +
        "planes/centroids must be built for this embedding dimension")
  private def getter(et: DataType, arr: String, i: String): String =
    if (et == FloatType) s"$arr.getFloat($i)" else s"$arr.getDouble($i)"
  private def getD(a: ArrayData, et: DataType, i: Int): Double =
    if (et == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ aᵢ·bᵢ over min(len(a), len(b)). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(prettyName, left, right)
    override def prettyName: String = "vec_dot"
    private lazy val (lt, rt) = (elemType(left), elemType(right))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += getD(x, lt, i) * getD(y, rt, i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, i, s) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("s"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${getter(lt, a, i)} * ${getter(rt, b, i)};
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity in ONE traversal (xy, xx, yy fused); NULL (not
    * NaN) for zero-norm vectors — NaN sorts above every double in
    * Spark's total order, so it would pass `>= threshold` filters and
    * rank first in descending top-k. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(prettyName, left, right)
    override def prettyName: String = "vec_cosine"
    private lazy val (lt, rt) = (elemType(left), elemType(right))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
      while (i < n) {
        val xv = getD(x, lt, i); val yv = getD(y, rt, i)
        xy += xv * yv; xx += xv * xv; yy += yv * yv; i += 1
      }
      val denom = math.sqrt(xx) * math.sqrt(yy)
      if (denom > 0) xy / denom else null
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx")
        val yy = ctx.freshName("yy"); val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv"); val den = ctx.freshName("den")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = ${getter(lt, a, i)};
           |  double $yv = ${getter(rt, b, i)};
           |  $xy += $xv * $yv; $xx += $xv * $xv; $yy += $yv * $yv;
           |}
           |double $den = java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy);
           |if ($den > 0) { ${ev.value} = $xy / $den; } else { ${ev.isNull} = true; }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Random-hyperplane LSH signature: bit p set iff plane_p · v > 0.
    * All planes evaluated in one generated loop nest; the plane matrix
    * rides along as a codegen reference object (flattened row-major),
    * broadcast once per task, not per row. */
  case class RhpSignature(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    require(planes.length <= 64,
      s"RHP signature is a 64-bit word: at most 64 planes, got ${planes.length}")
    require(planes.nonEmpty && planes(0).nonEmpty,
      "RHP signature needs a non-empty plane matrix (>=1 plane of dim>=1); " +
        "an empty matrix would reject every input row at eval time")
    require(planes.forall(_.length == planes(0).length),
      "hyperplane rows must share one dimensionality")
    override def dataType: DataType = LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(prettyName, child)
    private lazy val et = elemType(child)
    private val numPlanes = planes.length
    private val dim = if (planes.isEmpty) 0 else planes(0).length
    private lazy val flat: Array[Double] = planes.flatten

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      requireDim(x.numElements(), dim, prettyName)
      val n = math.min(x.numElements(), dim)
      var sig = 0L; var p = 0
      while (p < numPlanes) {
        var s = 0.0; var i = 0; val off = p * dim
        while (i < n) { s += flat(off + i) * getD(x, et, i); i += 1 }
        if (s > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val p = ctx.freshName("p"); val s = ctx.freshName("s")
        val off = ctx.freshName("off"); val sig = ctx.freshName("sig")
        s"""
           |graft.functions.VectorExprs.requireDim(
           |  $a.numElements(), $dim, "rhp_signature");
           |int $n = java.lang.Math.min($a.numElements(), $dim);
           |long $sig = 0L;
           |for (int $p = 0; $p < $numPlanes; $p++) {
           |  double $s = 0.0;
           |  int $off = $p * $dim;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += $planesRef[$off + $i] * ${getter(et, a, i)};
           |  }
           |  if ($s > 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    }

    // structural equality/explain must not walk the (large) matrix
    override def flatArguments: Iterator[Any] = Iterator(child)
    override def prettyName: String = "rhp_signature"

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Index of the centroid with the largest dot product (spherical
    * k-means assignment — centroids are pre-normalized, so max-dot =
    * max-cosine). One generated loop nest per row; the centroid matrix
    * is a codegen reference object. */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(prettyName, child)
    require(centroids.nonEmpty && centroids(0).nonEmpty,
      "nearest-centroid needs a non-empty centroid matrix (>=1 centroid " +
        "of dim>=1); an empty one would reject every input row at eval time")
    require(centroids.forall(_.length == centroids(0).length),
      "centroid rows must share one dimensionality")
    private lazy val et = elemType(child)
    private val k = centroids.length
    private val dim = if (centroids.isEmpty) 0 else centroids(0).length
    private lazy val flat: Array[Double] = centroids.flatten

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      requireDim(x.numElements(), dim, prettyName)
      val n = math.min(x.numElements(), dim)
      var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
      while (c < k) {
        var s = 0.0; var i = 0; val off = c * dim
        while (i < n) { s += flat(off + i) * getD(x, et, i); i += 1 }
        if (s > bestDot) { bestDot = s; best = c }
        c += 1
      }
      best
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", flat, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val c = ctx.freshName("c"); val s = ctx.freshName("s")
        val off = ctx.freshName("off"); val best = ctx.freshName("best")
        val bestDot = ctx.freshName("bestDot")
        s"""
           |graft.functions.VectorExprs.requireDim(
           |  $a.numElements(), $dim, "nearest_centroid");
           |int $n = java.lang.Math.min($a.numElements(), $dim);
           |int $best = 0;
           |double $bestDot = java.lang.Double.NEGATIVE_INFINITY;
           |for (int $c = 0; $c < $k; $c++) {
           |  double $s = 0.0;
           |  int $off = $c * $dim;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += $cRef[$off + $i] * ${getter(et, a, i)};
           |  }
           |  if ($s > $bestDot) { $bestDot = $s; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })
    }

    override def flatArguments: Iterator[Any] = Iterator(child)
    override def prettyName: String = "nearest_centroid"

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Top-`n` centroid indices by dot product, ties to the lower index
    * (the same order [[graft.pipeline.Ivf.portableTopK]] ranks its
    * driver-side probe ring with) — the MAP-SIDE probe-ring generator
    * for the batch IVF k-NN join ([[graft.pipeline.Ivf.knnJoin]]):
    * one generated call per query row, so a million-query join never
    * touches the driver. Dot loop + selection run in
    * [[topCentroidsData]], invoked from whole-stage-generated code. */
  case class NearestCentroids(child: Expression,
                              centroids: Array[Array[Double]], n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(prettyName, child)
    require(centroids.nonEmpty && centroids(0).nonEmpty,
      "nearest-centroids needs a non-empty centroid matrix")
    require(centroids.forall(_.length == centroids(0).length),
      "centroid rows must share one dimensionality")
    require(n >= 1, "nearest-centroids needs n >= 1")
    private lazy val et = elemType(child)
    private val k = centroids.length
    private val dim = centroids(0).length
    private lazy val flat: Array[Double] = centroids.flatten

    override def nullSafeEval(a: Any): Any =
      topCentroidsData(a.asInstanceOf[ArrayData], et == FloatType,
        flat, k, dim, n)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", flat, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = graft.functions.VectorExprs.topCentroidsData(
           |  $a, ${et == FloatType}, $cRef, $k, $dim, $n);""".stripMargin)
    }

    override def flatArguments: Iterator[Any] = Iterator(child, n)
    override def prettyName: String = "nearest_centroids"

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Dots + top-n selection for [[NearestCentroids]]; called from
    * generated code. k is small (centroid counts), so the selection is
    * n linear scans — no allocation beyond the result. */
  def topCentroidsData(x: ArrayData, isFloat: Boolean, flat: Array[Double],
                       k: Int, dim: Int, n: Int): ArrayData = {
    requireDim(x.numElements(), dim, "nearest_centroids")
    val m = math.min(x.numElements(), dim)
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0; var i = 0; val off = c * dim
      while (i < m) {
        s += flat(off + i) *
          (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i))
        i += 1
      }
      dots(c) = s; c += 1
    }
    val nn = math.min(n, k)
    val out = new Array[Int](nn)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < nn) {
      var best = -1; var bd = Double.NegativeInfinity; var c2 = 0
      while (c2 < k) {
        if (!used(c2) && dots(c2) > bd) { bd = dots(c2); best = c2 }
        c2 += 1
      }
      used(best) = true; out(j) = best; j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** L2-normalized copy as array<double>; called from generated code.
    * Returns null for zero / non-finite norms (a normalized direction
    * does not exist) — callers surface that as a NULL column value. */
  def l2NormalizeData(x: ArrayData, isFloat: Boolean): ArrayData = {
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      ss += v * v
      i += 1
    }
    val norm = Math.sqrt(ss)
    if (norm == 0.0 || java.lang.Double.isNaN(norm) ||
        java.lang.Double.isInfinite(norm)) return null
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = v / norm
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Unit-norm copy of a vector (array<double>): NULL for zero or
    * non-finite norms — the ANN-prep normalization pass as one
    * generated traversal per row. */
  case class L2Normalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(prettyName, child)
    private lazy val isFloat = elemType(child) == FloatType
    override def prettyName: String = "vec_l2_normalize"

    override def nullSafeEval(a: Any): Any =
      l2NormalizeData(a.asInstanceOf[ArrayData], isFloat)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tmp = ctx.freshName("norm")
        s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        |  graft.functions.VectorExprs.l2NormalizeData($a, $isFloat);
        |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
        """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** int8 quantization; called from generated code. scale = maxAbs/127
    * (0.0 for the all-zero vector, whose codes are all 0); code_i =
    * round-half-away-from-zero(v_i / scale) clamped to [-127, 127] —
    * half-away matches SQL `round`, where Java's Math.round would
    * diverge on negative halves. Null for non-finite inputs. */
  def quantizeInt8Data(x: ArrayData, isFloat: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        return null
      val a = Math.abs(v)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val v = (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) / scale
        val r = if (v >= 0) Math.floor(v + 0.5) else Math.ceil(v - 0.5)
        val c = if (r > 127.0) 127L else if (r < -127.0) -127L else r.toLong
        out(i) = c.toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(out)))
  }

  val QuantSchema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false),
      nullable = false)))

  /** Per-vector int8 quantization: struct{scale, q array<tinyint>} —
    * the 4×-smaller ANN storage format, one generated traversal per
    * row; dequantize as `q_i * scale`. */
  case class QuantizeInt8(child: Expression) extends UnaryExpression {
    override def dataType: DataType = QuantSchema
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkVec(prettyName, child)
    private lazy val isFloat = elemType(child) == FloatType
    override def prettyName: String = "vec_quantize_int8"

    override def nullSafeEval(a: Any): Any =
      quantizeInt8Data(a.asInstanceOf[ArrayData], isFloat)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tmp = ctx.freshName("quant")
        s"""
        |org.apache.spark.sql.catalyst.InternalRow $tmp =
        |  graft.functions.VectorExprs.quantizeInt8Data($a, $isFloat);
        |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
        """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----- Column API -----
  def l2Normalize(v: Column): Column =
    GraftColumnBridge.column(L2Normalize(GraftColumnBridge.expression(v)))
  def quantizeInt8(v: Column): Column =
    GraftColumnBridge.column(QuantizeInt8(GraftColumnBridge.expression(v)))
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def rhpSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(RhpSignature(
      GraftColumnBridge.expression(v), planes.map(_.toArray).toArray))
  def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(v), centroids.map(_.toArray).toArray))
  def nearestCentroids(v: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(v), centroids.map(_.toArray).toArray, n))
}
