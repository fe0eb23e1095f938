package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def points = {
    import spark.implicits._
    Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L), (6L, 99L))
      .toDF("pid", "pt")
  }

  // [0,20) spans two width-10 buckets; [18,22) straddles a boundary;
  // [30,31) is sub-bucket; [40,40) is degenerate
  private def intervals = {
    import spark.implicits._
    Seq((100L, 0L, 20L), (200L, 18L, 22L), (300L, 30L, 36L), (400L, 40L, 40L))
      .toDF("iid", "s", "e")
  }

  test("pointInInterval: exact half-open semantics, multi-bucket and straddling intervals") {
    val out = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", bucketWidth = 10L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(
      (1L, 100L), (2L, 100L), (3L, 100L),  // 5,10,19 in [0,20)
      (3L, 200L),                          // 19 in [18,22)
      (4L, 200L),                          // 20 excluded from [0,20), inside [18,22)
      (5L, 300L)                           // 35 in [30,36)
      // 99 matches nothing; [40,40) degenerate matches nothing
    ))
  }

  test("pointInInterval: overlapping intervals surface each pair exactly once (no dedup pass)") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 30L), (2L, 0L, 30L), (3L, 5L, 6L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, "pt", iv, "s", "e", bucketWidth = 7L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, s"duplicated pairs: ${out.toSeq}")
    assert(out.toSet ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (2L, 2L), (3L, 2L),
        (4L, 2L), (1L, 3L)))
  }

  test("intervalOverlap: half-open overlap semantics, exactly-once across shared buckets") {
    import spark.implicits._
    // [0,100) shares many width-10 buckets with [50,90): must emit once.
    // [10,20) touches [20,30) only at the endpoint: no overlap.
    val a = Seq((1L, 0L, 100L), (2L, 10L, 20L), (3L, 200L, 210L)).toDF("aid", "as", "ae")
    val b = Seq((10L, 50L, 90L), (20L, 20L, 30L), (30L, 205L, 300L)).toDF("bid", "bs", "be")
    val out = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", bucketWidth = 10L)
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, s"duplicated pairs: ${out.toSeq}")
    assert(out.toSet == Set((1L, 10L), (1L, 20L), (3L, 30L)))
  }

  test("intervalOverlap plans no nested loop either") {
    import spark.implicits._
    val a = Seq((1L, 0L, 100L)).toDF("aid", "as", "ae")
    val b = Seq((10L, 50L, 90L)).toDF("bid", "bs", "be")
    val plan = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("a sentinel open-ended interval fails fast with the offending bounds, not mid-explode") {
    import spark.implicits._
    // Long.MaxValue end: unguarded, sequence() would blow past Spark's
    // max array length with an opaque error (or just under it, silently
    // fan out millions of rows)
    val sentinel = Seq((1L, 0L, Long.MaxValue)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", sentinel, "s", "e", bucketWidth = 10L)
        .count()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("interval covers more than"), s"got: $msg")
    assert(msg.contains("bucketWidth"), s"got: $msg")
    // the same guard protects intervalOverlap's two exploded sides
    val ex2 = intercept[Exception] {
      RangeJoin.intervalOverlap(
        Seq((1L, 0L, 100L)).toDF("aid", "as", "ae"),
        "as", "ae", sentinel, "s", "e", bucketWidth = 10L).count()
    }
    val msg2 = Option(ex2.getMessage).getOrElse("") +
      Option(ex2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("interval covers more than"), s"got: $msg2")
    // wide-but-legal intervals still work: 2^20 - 1 buckets is under the cap
    val wide = Seq((1L, 0L, 10L * ((1L << 20) - 1))).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(
      points, "pt", wide, "s", "e", bucketWidth = 10L).count() >= 1)
  }

  test("pointInInterval plans an equi-join on the bucket, never a nested loop") {
    val plan = RangeJoin
      .pointInInterval(points, "pt", intervals, "s", "e", bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the q74-shaped plain range join, for contrast, IS a nested loop
    val naive = points.join(intervals, col("pt") >= col("s") && col("pt") < col("e"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin"), naive)
  }
}
