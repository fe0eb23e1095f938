package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.9 surface): per-group top-k by score with a
  * bounded heap buffer — O(k) state per group instead of sorting the
  * whole group, which is the scalable alternative to a rank-window for
  * per-key top-k (no per-partition full sort, map-side partial top-k
  * combines before the shuffle).
  *
  * IN = (score, id); OUT = ids ordered by (score desc, id asc). Ties
  * break on the smaller id so results are deterministic.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)], Seq[Long]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty

  private def trim(b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    if (b.length > 4 * k) {
      val kept = b.sorted(ord).take(k)
      b.clear(); b ++= kept
    }
    b
  }

  override def reduce(
      b: mutable.ArrayBuffer[(Double, Long)], a: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] =
    trim(b += a)

  override def merge(
      b1: mutable.ArrayBuffer[(Double, Long)],
      b2: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] =
    trim(b1 ++= b2)

  override def finish(b: mutable.ArrayBuffer[(Double, Long)]): Seq[Long] =
    b.sorted(ord).take(k).map(_._2).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
