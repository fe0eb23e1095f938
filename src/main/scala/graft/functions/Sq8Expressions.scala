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

  private def quantize(x: Float, i: Int): Long = {
    val span = mxA(i) - mnA(i)
    if (span == 0.0) 0L
    else {
      // exact op order mirrored by the oracle: sub, *255.0, /span, floor
      val v = Math.floor((x.toDouble - mnA(i)) * 255.0 / span)
      Math.min(255.0, Math.max(0.0, v)).toLong
    }
  }

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
