package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a STATIC serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] — the runtime-filter
  * pattern, made explicit as a reusable predicate.
  *
  * The intended shape (see [[graft.dedup.Dedup.dedupAgainstIndexBloom]]):
  * build the filter over the SMALL side of a join (one distributed
  * aggregate, a bounded few-MB sketch on the driver), then use this
  * predicate to prune the HUGE side's scan before the shuffle. Blooms
  * have no false negatives, so pruning rows the filter rejects can
  * never change the join's result — only false positives survive
  * needlessly, and the exact join still removes them. Correctness is
  * therefore independent of `fpp`; `fpp` only tunes how much of the big
  * side is shuffled.
  *
  * The serialized filter ships with the plan once per executor
  * (`addReferenceObj`), deserialized lazily per JVM — the same static
  * distribution contract as [[ShingleOverlapSet]]. Probe parity:
  * `DataFrameStatFunctions.bloomFilter` inserts string values by their
  * UTF-8 bytes, and `mightContainBinary(utf8Bytes)` is the sketch's own
  * dual of that insert.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
    else if (filterBytes == null || filterBytes.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-empty serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  /** Called from generated code. */
  def mightContain(v: UTF8String): Boolean = filter.mightContainBinary(v.getBytes)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, t => s"$ref.mightContain($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def bloomMightContain(c: Column, bf: BloomFilter): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(c), serialize(bf)))
}

/** [[BloomMightContain]] for LONG keys — the pre-shuffle join filter
  * (optimization-guide §3.2) for integer-keyed joins: build the sketch
  * over the small side's key (`DataFrameStatFunctions.bloomFilter` on a
  * long column inserts via `putLong`; `mightContainLong` is its exact
  * dual), probe the big side map-side BEFORE its exchange. No false
  * negatives, so the downstream exact join's result is unchanged —
  * `fpp` only tunes how many non-matching rows still pay the shuffle.
  * Composite keys probe as `xxhash64(k1, k2, ...)` built identically
  * on both sides (a hash collision is just another false positive the
  * exact join removes). */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint argument, got ${child.dataType.simpleString}")
    else if (filterBytes == null || filterBytes.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-empty serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  /** Called from generated code. */
  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomLongExpr", this, classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, t => s"$ref.mightContain($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  def bloomMightContainLong(c: Column, bf: BloomFilter): Column =
    GraftBridge.column(BloomMightContainLong(
      GraftBridge.expression(c), BloomMightContain.serialize(bf)))
}
