package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Squared L2 distance between two `array<float>` vectors AFTER 8-bit
  * scalar quantization (SQ8) with per-dimension corpus [min, max]
  * ranges: `q(x, d) = clamp(floor((x - min_d) * 255 / (max_d - min_d)),
  * 0, 255)`, distance `sum((q_a - q_b)^2)` as a long.
  *
  * This is the memory-bandwidth play of IVF-SQ8-style indexes (e.g.
  * Faiss `IndexIVFScalarQuantizer`): at 100 TB the quantized corpus is
  * 4x smaller than float32 — 4x less scan I/O and cache pressure per
  * candidate — and the integer distance loop vectorizes. The ranges are
  * a dims-sized global statistic (one tiny aggregate over the corpus),
  * embedded here as literals, exactly like the IVF centroid list.
  *
  * Quantize-then-compare is FUSED into one codegen'd kernel so the plan
  * never materializes the quantized arrays at query time (a stored
  * index would materialize them once at WRITE time instead — see
  * `Similarity.sq8TopK`'s doc for that composition).
  *
  * Determinism contract (what makes the DuckDB oracle exact): every
  * step is IEEE double arithmetic in a fixed order — (x - mn), * 255.0,
  * / span, floor, clamp — then exact integer sums. No float-margin
  * analysis is needed, unlike the cosine ops.
  */
case class Sq8L2Distance(
    left: Expression, right: Expression, mins: Seq[Double], maxs: Seq[Double])
    extends BinaryExpression with RequiresFloatArrays {

  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_l2_distance"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrays = floatArrayCheck(Seq(left, right), prettyName)
    if (!arrays.isSuccess) arrays
    else if (mins.length != maxs.length || mins.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires equal-length non-empty min/max ranges, " +
          s"got ${mins.length} and ${maxs.length}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val mnA: Array[Double] = mins.toArray
  @transient private lazy val mxA: Array[Double] = maxs.toArray

  /** Called from generated code. Dimensions beyond the range list (or
    * the shorter vector) are ignored, mirroring the other vector
    * kernels' min-length contract. */
  def distance(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(math.min(a.numElements(), b.numElements()), mnA.length)
    var s = 0L
    var i = 0
    while (i < n) {
      val d = quantize(a.getFloat(i), i) - quantize(b.getFloat(i), i)
      s += d * d
      i += 1
    }
    s
  }

  private def quantize(x: Float, i: Int): Long =
    Sq8.quantize(x.toDouble, mnA(i), mxA(i))

  override def nullSafeEval(a: Any, b: Any): Any =
    distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Expr", this, classOf[Sq8L2Distance].getName)
    defineCodeGen(ctx, ev, (x, y) => s"$ref.distance($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Sq8L2Distance {
  def sq8L2(a: Column, b: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    GraftBridge.column(
      Sq8L2Distance(GraftBridge.expression(a), GraftBridge.expression(b), mins, maxs))
}

/** The one SQ8 grid definition every consumer shares — the fused
  * distance kernel ([[Sq8L2Distance]]), the materializing quantizer
  * ([[Sq8Quantize]]), and driver-side codebook quantization must agree
  * bit-for-bit or stored codes and query-time distances drift apart. */
object Sq8 {
  /** Exact op order mirrored by the oracles: sub, *255.0, /span,
    * floor, clamp. */
  def quantize(x: Double, mn: Double, mx: Double): Long = {
    val span = mx - mn
    if (span == 0.0) 0L
    else {
      val v = Math.floor((x - mn) * 255.0 / span)
      Math.min(255.0, Math.max(0.0, v)).toLong
    }
  }
}

/** Materializing SQ8 quantizer: `array<float>` -> `array<long>` codes
  * under per-dimension global [min, max] ranges — the WRITE-time half
  * of the SQ8/PQ story ([[Sq8L2Distance]] fuses the same grid into a
  * distance for the index-less path). Quantizing once and slicing per
  * subspace is exactly equivalent to quantizing each slice under
  * sliced ranges (the grid is per-dimension), which is what lets PQ
  * encode in ONE corpus scan. Dimensions beyond the range list are
  * ignored (min-length contract shared with the other kernels). */
case class Sq8Quantize(child: Expression, mins: Seq[Double], maxs: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with RequiresFloatArrays {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sq8_quantize"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrays = floatArrayCheck(Seq(child), prettyName)
    if (!arrays.isSuccess) arrays
    else if (mins.length != maxs.length || mins.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires equal-length non-empty min/max ranges, " +
          s"got ${mins.length} and ${maxs.length}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val mnA: Array[Double] = mins.toArray
  @transient private lazy val mxA: Array[Double] = maxs.toArray

  /** Called from generated code. */
  def quantizeArray(a: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), mnA.length)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Sq8.quantize(a.getFloat(i).toDouble, mnA(i), mxA(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = quantizeArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8qExpr", this, classOf[Sq8Quantize].getName)
    defineCodeGen(ctx, ev, x => s"$ref.quantizeArray($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Quantize {
  def sq8Quantize(a: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    GraftBridge.column(Sq8Quantize(GraftBridge.expression(a), mins, maxs))
}

/** Squared L2 distance between two `array<long>` code vectors (sum of
  * squared element diffs over the shorter length) — the integer
  * distance the PQ/SQ8 serving path runs over STORED codes, where
  * [[Sq8L2Distance]] is its fused quantize-on-the-fly twin.
  *
  * Contract: inputs are small quantization CODES (SQ8: 0..255 — exact
  * up to ~2^44 dimensions). The long arithmetic is unchecked for
  * speed, so feeding arbitrary bigints (element diffs above ~3e9)
  * wraps silently; this is a code-vector kernel, not a general vector
  * distance. */
case class IntArrayL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int_array_l2"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Called from generated code. */
  def distance(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intL2Expr", this, classOf[IntArrayL2].getName)
    defineCodeGen(ctx, ev, (x, y) => s"$ref.distance($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntArrayL2 {
  def intArrayL2(a: Column, b: Column): Column =
    GraftBridge.column(IntArrayL2(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** The m PQ codes of one quantized vector as a single codegen'd kernel:
  * per subspace s, the argmin over the embedded codebook's kCent
  * centroids of the [[IntArrayL2]] distance between the vector's s-th
  * subDim-slice and the centroid's pre-quantized `qsub` — strict-less
  * comparison, so integer-distance ties resolve to the LOWER centroid
  * index, exactly `min_by(j, (d, j))`. One tight loop instead of an
  * m x kCent expression tree (m=8, kCent=16 built 128 slice +
  * distance nodes — past whole-stage codegen's method budget, so the
  * hot encode path fell back to interpreted evaluation). The codebook
  * rides `addReferenceObj` like the other static artifacts. */
case class PqEncodeCodes(
    child: Expression, codebook: Array[Array[Array[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _)
          if codebook.nonEmpty && codebook.forall(_.nonEmpty) =>
        TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-empty codebook")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> input, got ${other.simpleString}")
    }

  /** Called from generated code. Dimensions beyond the vector's length
    * are ignored (min-length contract shared with [[IntArrayL2]]). */
  def encode(qv: ArrayData): ArrayData = {
    val m = codebook.length
    val subDim = codebook(0)(0).length
    val n = qv.numElements()
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      val base = s * subDim
      var bestD = Long.MaxValue
      var bestJ = 0L
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d = 0L
        var i = 0
        while (i < subDim && base + i < n) {
          val diff = qv.getLong(base + i) - c(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestJ = j.toLong }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncExpr", this, classOf[PqEncodeCodes].getName)
    defineCodeGen(ctx, ev, x => s"$ref.encode($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeCodes {
  def pqEncodeCodes(qv: Column, codebook: Array[Array[Array[Long]]]): Column =
    GraftBridge.column(PqEncodeCodes(GraftBridge.expression(qv), codebook))
}

/** The flattened ADC lookup table of one quantized query vector as a
  * single codegen'd kernel: entry (s * kCent + j) is the
  * [[IntArrayL2]] distance between the query's s-th subDim-slice and
  * codebook centroid (s, j) — the same m x kCent integers the
  * explode-join LUT carried as rows, one array per query row. */
case class PqLutFlat(
    child: Expression, codebook: Array[Array[Array[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut_flat"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _)
          if codebook.nonEmpty && codebook.forall(_.nonEmpty) =>
        TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-empty codebook")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> input, got ${other.simpleString}")
    }

  /** Called from generated code. */
  def lut(qv: ArrayData): ArrayData = {
    val m = codebook.length
    val kCent = codebook(0).length
    val subDim = codebook(0)(0).length
    val n = qv.numElements()
    val out = new Array[Long](m * kCent)
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      val base = s * subDim
      var j = 0
      while (j < kCent) {
        val c = cents(j)
        var d = 0L
        var i = 0
        while (i < subDim && base + i < n) {
          val diff = qv.getLong(base + i) - c(i)
          d += diff * diff
          i += 1
        }
        out(s * kCent + j) = d
        j += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = lut(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLutExpr", this, classOf[PqLutFlat].getName)
    defineCodeGen(ctx, ev, x => s"$ref.lut($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqLutFlat {
  def pqLutFlat(qv: Column, codebook: Array[Array[Array[Long]]]): Column =
    GraftBridge.column(PqLutFlat(GraftBridge.expression(qv), codebook))
}

/** The ADC distance of one candidate against one query's flattened LUT
  * — sum over subspaces of lut[s * kCent + codes[s]] — as a single
  * codegen'd kernel. Replaces a per-row zip_with + aggregate
  * higher-order-function pair, which evaluated interpreted (HOFs are
  * outside whole-stage codegen) and allocated per candidate row on the
  * serve path's hottest loop. Integer addition in ascending-s order —
  * exact and identical to the join-then-`sum(d)` formulation. */
case class PqAdcDistance(left: Expression, right: Expression, kCent: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_distance"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) => true
      case _ => false
    })
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (kCent <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires kCent > 0, got $kCent")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Called from generated code. */
  def distance(codes: ArrayData, lut: ArrayData): Long = {
    val m = codes.numElements()
    var s = 0
    var d = 0L
    while (s < m) {
      d += lut.getLong(s * kCent + codes.getLong(s).toInt)
      s += 1
    }
    d
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcExpr", this, classOf[PqAdcDistance].getName)
    defineCodeGen(ctx, ev, (x, y) => s"$ref.distance($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcDistance {
  def pqAdcDistance(codes: Column, lut: Column, kCent: Int): Column =
    GraftBridge.column(PqAdcDistance(
      GraftBridge.expression(codes), GraftBridge.expression(lut), kCent))
}
