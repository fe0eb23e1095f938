package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared analysis-time input validation: these kernels read primitive
  * floats straight out of ArrayData, so anything other than
  * array<float> (e.g. array<double>) would silently produce garbage —
  * reject it at analysis instead. (ExpectsInputTypes is private[sql];
  * checkInputDataTypes is the public seam.) */
private[functions] trait RequiresFloatArrays { self: Expression =>
  protected def floatArrayCheck(exprs: Seq[Expression], name: String): TypeCheckResult =
    exprs.zipWithIndex.collectFirst {
      case (e, i) if !e.dataType.isInstanceOf[ArrayType] ||
          e.dataType.asInstanceOf[ArrayType].elementType != FloatType =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires array<float> arguments, argument ${i + 1} is ${e.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** Cosine similarity over two `array<float>` columns, accumulating in
  * double. North-star similarity-search primitive (SURVEY.md §2.10).
  *
  * Implemented as a native Catalyst expression (not a Scala UDF) so it
  * stays inside whole-stage codegen: `doGenCode` emits a direct static
  * call with no boxing of the arrays and no Row conversion — the hot
  * loop reads primitives straight out of the `ArrayData` (Tungsten
  * UnsafeArrayData at runtime).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with RequiresFloatArrays {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override def checkInputDataTypes(): TypeCheckResult =
    floatArrayCheck(Seq(left, right), prettyName)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.VectorOps.cosine($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two `array<float>` columns (double accumulator). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with RequiresFloatArrays {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def checkInputDataTypes(): TypeCheckResult =
    floatArrayCheck(Seq(left, right), prettyName)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.VectorOps.dot($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance over two `array<float>` columns (double
  * accumulator). Squared — not rooted — because its only use is argmin
  * centroid assignment (IVF coarse quantization), where sqrt is a
  * monotone no-op that just costs a branch per row. */
case class L2SqDistance(left: Expression, right: Expression)
    extends BinaryExpression with RequiresFloatArrays {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_distance"
  override def checkInputDataTypes(): TypeCheckResult =
    floatArrayCheck(Seq(left, right), prettyName)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.VectorOps.l2sq($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an `array<float>` column. */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with RequiresFloatArrays {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    floatArrayCheck(Seq(child), prettyName)

  override def nullSafeEval(a: Any): Any =
    VectorOps.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.VectorOps.norm($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernels called from generated code — keep them tiny and
  * branch-light; JIT inlines them into the codegen'd stage. */
object VectorOps {
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(x: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val a = x.getFloat(i).toDouble; s += a * a; i += 1 }
    math.sqrt(s)
  }

  def l2sq(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }
}

/** Column-level API for the vector expressions. */
object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  def l2Norm(a: Column): Column =
    GraftBridge.column(L2Norm(GraftBridge.expression(a)))
  def l2Sq(a: Column, b: Column): Column =
    GraftBridge.column(L2SqDistance(GraftBridge.expression(a), GraftBridge.expression(b)))
}
