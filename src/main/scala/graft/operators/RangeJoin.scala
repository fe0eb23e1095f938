package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join without a nested loop.
  *
  * Spark plans a pure range predicate — no equi-key — as
  * BroadcastNestedLoopJoin: O(|points| x |intervals|) compares and a
  * broadcast of one whole side, the first thing that dies at scale.
  * The standard fix is bucketing: quantize the domain into fixed-width
  * buckets, emit each interval once per bucket it covers, give each
  * point its single containing bucket, and equi-join on the bucket id
  * before applying the exact range predicate as a residual filter.
  * The cross product shrinks to pairs that share a bucket, the join is
  * a plain shuffled (or broadcast) hash join on a long key, and the
  * residual keeps the semantics exact.
  *
  * A point lives in exactly one bucket, and an interval lists each
  * covered bucket once — so every qualifying (point, interval) pair
  * surfaces exactly once and NO distinct pass is needed (dedup after a
  * fan-out join is itself a scale trap).
  *
  * `bucketWidth` trades fan-out for selectivity: intervals explode
  * into (len / width + 1) rows, while a too-wide bucket degrades the
  * prefilter toward the cross product. Pick it near the typical
  * interval length. Skewed domains (all points in one hot bucket)
  * inherit the engine's AQE skew-join handling since the join is a
  * plain equi-join.
  */
object RangeJoin {

  /** Per-interval bucket fan-out cap: an interval explodes into
    * (len / bucketWidth + 1) rows, so ONE pathological interval — an
    * open-ended sentinel end like Long.MaxValue is the classic — would
    * either exceed Spark's max array length inside `sequence()` (one
    * opaque failure killing the whole job) or silently fan out millions
    * of skewed rows just under that limit. Intervals covering more than
    * this many buckets fail FAST with an actionable message naming the
    * offending bounds; the fix is always a wider `bucketWidth` or
    * clamping sentinel ends before the join, never a bigger cap. */
  val MaxBucketsPerInterval: Long = 1L << 20

  /** The exploded covered-bucket ids of [start, end), guarded by
    * [[MaxBucketsPerInterval]]. The guard rides inside the sequence's
    * end argument (a when/raise_error branch), so column pruning can
    * never drop it — it is evaluated exactly when the fan-out it
    * bounds would happen. `div` is true integer division — routing
    * through double division would silently lose precision above 2^53
    * (epoch micros are 2^50+). */
  private def coveredBuckets(s: String, e: String, bucketWidth: Long) = {
    val startBucket = expr(s"$s div $bucketWidth")
    val endBucket = expr(s"($e - 1) div $bucketWidth")
    val guardedEnd = when(
      endBucket - startBucket < lit(MaxBucketsPerInterval), endBucket)
      .otherwise(raise_error(concat(
        lit(s"interval covers more than $MaxBucketsPerInterval buckets: start="),
        col(s), lit(" end="), col(e), lit(s" bucketWidth=$bucketWidth — raise " +
          "bucketWidth or clamp open-ended sentinel intervals"))))
    explode(sequence(startBucket, guardedEnd))
  }

  /** Join `points` to every interval containing them:
    * `point >= startCol && point < endCol` (half-open).
    *
    * All three columns must be LONGS in one unit (epoch micros, token
    * offsets, ...): integer bucket arithmetic is exact and
    * engine-agnostic, where timestamp/interval types invite precision
    * drift. Degenerate intervals (start >= end) match nothing and are
    * dropped before the explode. Domain values must be non-negative
    * (bucket id uses integer division). Intervals wider than
    * [[MaxBucketsPerInterval]] buckets raise rather than fan out.
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", expr(s"$pointCol div $bucketWidth"))
    val i = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("_bucket", coveredBuckets(startCol, endCol, bucketWidth))
    p.join(i, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }

  /** Join two interval sets on overlap (half-open:
    * `lStart < rEnd && rStart < lEnd`), same bucketing idea as
    * [[pointInInterval]] — but an overlapping PAIR now shares every
    * bucket both intervals cover, so naive bucket-join-then-filter
    * would emit it once per shared bucket. Instead of a dedup pass
    * (a shuffle over the whole join output), each pair is claimed by
    * exactly ONE bucket: the bucket containing the overlap's start,
    * `max(lStart, rStart)` — computable from the pair alone, so a
    * cheap post-join predicate keeps exactly one copy. Both sides
    * explode by their covered buckets; all columns must be
    * non-negative longs in one unit. */
  def intervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) < col(e))
        .withColumn("_bucket", coveredBuckets(s, e, bucketWidth))
    explodeBuckets(left, lStart, lEnd)
      .join(explodeBuckets(right, rStart, rEnd), Seq("_bucket"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("_bucket") === expr(s"greatest($lStart, $rStart) div $bucketWidth"))
      .drop("_bucket")
  }
}
