package graft.functions

import java.nio.ByteBuffer

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Raw-buffer MinHash sketch aggregate (SURVEY.md §2.9: the
  * `TypedImperativeAggregate` tier, reserved for sketches).
  *
  * One pass over a group's shingles maintains `k` running minima of
  * seeded 64-bit hashes in a primitive `Array[Long]` buffer — no
  * per-row allocation, map-side partial aggregation merges buffers
  * elementwise, and serialization is a flat 8k-byte blob. This is the
  * cheapest way to compute MinHash signatures at 100 TB: the md5-based
  * signature in [[graft.dedup.Dedup.minhashSignature]] exists for
  * DuckDB-oracle exactness; this sketch is the production hash family
  * (two 32-bit murmur lanes per seed, combined to 64 bits).
  *
  * Hash families (`family`):
  *  - `murmur64` (default, production): k seeded murmur3 64-bit lanes —
  *    fast, engine-specific (not reproducible outside the JVM);
  *  - `md5chunk16`: the k <= 8 disjoint 16-bit chunks of ONE md5 per
  *    input, the same engine-agnostic family as
  *    [[graft.dedup.Dedup.minhashSignature]] — numerically identical to
  *    what `min(CAST(('0x' || substr(md5(g), 4i+1, 4)) AS BIGINT))`
  *    computes in DuckDB, which is what gives the UDAF a hash-exact
  *    oracle (q52).
  */
case class MinHashSketchAgg(
    child: Expression,
    k: Int,
    family: String = "murmur64",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sketch requires a string argument, got ${child.dataType.simpleString}")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sketch requires a positive literal k, got $k")
    else if (family != "murmur64" && family != "md5chunk16")
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unknown minhash_sketch family '$family' (murmur64 | md5chunk16)")
    else if (family == "md5chunk16" && k > 8)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5chunk16 yields 8 x 16-bit chunks per digest; k=$k > 8")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  private lazy val md5Family: Boolean = family == "md5chunk16"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      if (md5Family) {
        val d = MinHashSketchAgg.md5(bytes)
        var i = 0
        while (i < k) {
          val h = (((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)).toLong
          if (h < buffer(i)) buffer(i) = h
          i += 1
        }
      } else {
        var i = 0
        while (i < k) {
          val h = MinHashSketchAgg.hash64(bytes, i)
          if (h < buffer(i)) buffer(i) = h
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSketchAgg {
  /** Deterministic seeded 64-bit hash: two murmur3 32-bit lanes. */
  def hash64(bytes: Array[Byte], seed: Int): Long = {
    val lo = MurmurHash3.bytesHash(bytes, seed)
    val hi = MurmurHash3.bytesHash(bytes, seed ^ 0x5bd1e995)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  // MessageDigest is stateful; one instance per thread, reset by digest()
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[functions] def md5(bytes: Array[Byte]): Array[Byte] =
    md5Local.get().digest(bytes)

  /** Estimated Jaccard similarity of two sketches: fraction of agreeing
    * minima. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }

  def minhashSketch(c: Column, k: Int, family: String = "murmur64"): Column =
    GraftBridge.column(
      MinHashSketchAgg(GraftBridge.expression(c), k, family).toAggregateExpression())
}
