package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch (SURVEY.md §2.9's
  * `TypedImperativeAggregate` tier — the sketch family's heavy-hitters
  * member, next to HLL q92, quantiles q118, bloom q64, MinHash q52):
  * one pass maintains at most `capacity` (item, counter) pairs; a new
  * item over a full summary decrements EVERY counter instead of
  * evicting by recency, which is what buys the guarantee.
  *
  * Guarantees (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS'12):
  *  - every item with true count > N/(capacity+1) IS in the summary;
  *  - each reported estimate underestimates by at most N/(capacity+1).
  * Both survive arbitrary partitioning: the partial buffers merge by
  * counter addition followed by subtracting the (capacity+1)-th
  * largest counter — so map-side partial aggregation is exact w.r.t.
  * the guarantee, one bounded buffer per partition reaches the merge.
  *
  * This is the 100 TB vocabulary/hot-key pass: the full term count is
  * never materialized — the sketch shortlists O(capacity) candidates,
  * and a second broadcast-IN-filtered aggregation computes EXACT
  * counts for the candidates alone (q124's shape), so output is exact
  * while nothing unbounded ever shuffles.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string argument, got ${child.dataType.simpleString}")
    else if (capacity < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a positive capacity, got $capacity")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None if buffer.size < capacity => buffer.update(s, 1L)
        case None =>
          // summary full: decrement all, drop zeros (never evict the
          // newcomer specially — this is the step the guarantee rides on)
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.foreach { case (k, c) =>
            if (c == 1L) dead += k else buffer.update(k, c - 1)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesAgg.mergeSummaries(b1, b2, capacity)

  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.toArray.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
        val row = new GenericInternalRow(2)
        row.update(0, UTF8String.fromString(t))
        row.setLong(1, c)
        row
      })

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val kb = new Array[Byte](len); in.readFully(kb)
      m.update(new String(kb, "UTF-8"), in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  def misraGries(c: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c), capacity).toAggregateExpression())

  /** Merge `b2` into `b1` under `capacity` — the mergeable-summaries
    * combine (Agarwal et al., PODS'12) shared by the aggregate's
    * partial-merge and the durable streamed summary store: counters
    * add, then the (capacity+1)-th largest counter is subtracted from
    * everything (at most `capacity` counters can exceed it, and the
    * cumulative subtraction across any merge tree stays within the
    * N/(capacity+1) error budget). Returns `b1`, mutated. */
  def mergeSummaries(
      b1: mutable.HashMap[String, Long],
      b2: scala.collection.Map[String, Long],
      capacity: Int): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val offset = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      b1.foreach { case (k, c) =>
        if (c <= offset) dead += k else b1.update(k, c - offset)
      }
      dead.foreach(b1.remove)
    }
    b1
  }
}
