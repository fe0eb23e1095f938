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
