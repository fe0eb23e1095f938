package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Regression.groupedOls: exact rational slope on hand-computed
  * points, the degenerate vertical-group contract, and the one-shuffle
  * plan claim.
  */
class RegressionSpec extends SparkSpec {

  test("exact slope on known points") {
    val spark0 = spark
    import spark0.implicits._
    // g: (0,0),(1,2),(2,4) -> slope exactly 2 (num=12, den=6)
    // h: (0,5),(1,4),(2,3) -> slope exactly -1 (num=-6, den=6)
    val df = Seq(
      ("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L),
      ("h", 0L, 5L), ("h", 1L, 4L), ("h", 2L, 3L)
    ).toDF("grp", "x", "y")
    val out = Regression.groupedOls(df, "grp", "x", "y")
      .orderBy("grp").collect()
    val g = out(0); val h = out(1)
    assert(g.getLong(4) == 12L && g.getLong(5) == 6L && g.getDouble(6) == 2.0)
    assert(h.getLong(4) == -6L && h.getLong(5) == 6L && h.getDouble(6) == -1.0)
  }

  test("vertical group: den = 0, slope NULL — detectable, not a crash") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("v", 1L, 1L), ("v", 1L, 5L)).toDF("grp", "x", "y")
    val out = Regression.groupedOls(df, "grp", "x", "y").collect().head
    assert(out.getLong(5) == 0L)
    assert(out.isNullAt(6), "ANSI mode raises on /0 — try_divide must yield NULL")
  }

  test("moment sums give the same slope under any partitioning") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (1L to 1000L).map(i => ("g", i, 3L * i + (i % 7)))
    val one = Regression.groupedOls(rows.toDF("grp", "x", "y").coalesce(1),
      "grp", "x", "y").collect().head
    val many = Regression.groupedOls(rows.toDF("grp", "x", "y").repartition(13),
      "grp", "x", "y").collect().head
    assert(one.getLong(4) == many.getLong(4) && one.getLong(5) == many.getLong(5))
  }

  test("single aggregation pass: exactly one shuffle in the plan") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("g", 1L, 1L)).toDF("grp", "x", "y")
    val plan = Regression.groupedOls(df, "grp", "x", "y")
      .queryExecution.executedPlan
    assert(plan.collect { case s: ShuffleExchangeExec => s }.size <= 1,
      "OLS must reduce to one grouped aggregation — no join, no window")
  }
}
