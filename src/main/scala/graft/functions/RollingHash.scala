package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string (document fingerprinting,
  * SURVEY.md §2.10): h = Σ h*31 + byte, wrapping in long — the classic
  * Java-style content hash, computed over UTF-8 bytes without copying.
  *
  * Native Catalyst expression with `doGenCode` so it runs inside
  * whole-stage codegen; the per-row kernel reads bytes straight from the
  * Tungsten `UTF8String`. (No DuckDB oracle — 64-bit wrapping arithmetic
  * is not portable SQL — so its query gets the driver's rows-only check;
  * cross-checked in ScalaTest against a JVM reference implementation.)
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    RollingHash.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.RollingHash.hash($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) { h = h * 31L + (s.getByte(i) & 0xffL); i += 1 }
    h
  }

  def rollingHash(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))
}
