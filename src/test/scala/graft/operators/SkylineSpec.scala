package graft.operators

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** Skyline.pareto2D: dominance semantics vs the quadratic definition
  * (including both-dim ties), and the linear plan shape.
  */
class SkylineSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet

  test("hand fixture: within-group dominance, cross-group dominance, frontier ties") {
    val spark0 = spark
    import spark0.implicits._
    val pts = Seq(
      (1L, 5L, 10L),  // frontier
      (2L, 5L, 9L),   // dominated within x-group by 1
      (3L, 7L, 8L),   // frontier (more x, less y than 1)
      (4L, 6L, 8L),   // dominated by 3 (x 6<7, y equal)
      (5L, 7L, 8L),   // exact tie with 3 -> BOTH survive
      (6L, 1L, 1L),   // dominated by everything
      (7L, 9L, 1L)    // frontier (max x)
    )
    val out = Skyline.pareto2D(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 5L, 7L))
    assert(out == brute(pts))
  }

  test("matches brute force on a dense grid with heavy ties") {
    val spark0 = spark
    import spark0.implicits._
    val pts = (1L to 200L).map(i => (i, i % 10, (i * 7) % 13))
    val out = Skyline.pareto2D(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(out == brute(pts))
  }

  test("plan: no cartesian/BNLJ — the quadratic form never materializes") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 50L).map(i => (i, i % 5, i % 7)).toDF("id", "x", "y")
    val plan = Skyline.pareto2D(df, "x", "y").queryExecution.executedPlan
    assert(plan.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }.isEmpty)
  }
}
