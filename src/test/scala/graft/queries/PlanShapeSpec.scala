package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Executed-plan shape gates for the round-13 additions whose scale
  * posture lives in the JOIN structure (the operator-level specs pin
  * semantics; these pin that the real registry queries keep the plan
  * they were designed around): iterative PageRank, oriented triangle
  * wedges, banded perceptual-hash pairing, and the blocked
  * edit-distance join must never degrade to a cartesian product or a
  * broadcast nested loop — at 100 TB that is the difference between a
  * bounded join and an impossible one.
  */
class PlanShapeSpec extends SparkSpec {

  private val guarded = Seq(
    "q139_pagerank",
    "q143_triangle_counts",
    "q145_image_near_dup",
    "q138_edit_distance_pairs",
    "q146_gap_fill")

  guarded.foreach { name =>
    test(s"$name plans without cartesian/BNLJ") {
      val df = SparkEntry.queries(name)(spark, sf001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  Seq("q207_sole_late_supplier", "q208_lateral_topk").foreach { name =>
    test(s"$name decorrelates (no subquery stage, no cartesian)") {
      // q207's EXISTS + NOT EXISTS pair must land as semi/anti hash
      // joins; q208's correlated LATERAL LIMIT as a rank rewrite
      // joined on the correlation key — in both cases the physical
      // plan carries no per-row subquery stage
      val df = SparkEntry.queries(name)(spark, sf001)
      df.collect()
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Subquery"), physical)
      assert(!physical.contains("CartesianProduct"), physical)
    }
  }

  test("q216 decorrelates the correlated MIN-over-join (TPC-H Q2 shape)") {
    // the scalar MIN over a four-table join, correlated on p_partkey,
    // must become one aggregate joined back — NO subquery survives
    // anywhere and every join is an equi hash join
    val df = SparkEntry.queries("q216_correlated_min_over_join")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"), optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Subquery"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
    assert(physical.contains("Join"), physical)
  }

  test("q217/q219 keep exactly ONE one-shot UNCORRELATED scalar subquery") {
    // the whole-table scalar (Q11's HAVING threshold, Q22's avg) is
    // the plan where a subquery SHOULD survive — executed once as a
    // broadcast scalar, never re-run per row: assert one scalar-
    // subquery with EMPTY outer references (`[]`), and none with a
    // non-empty (correlated) reference list
    val correlated = """scalar-subquery#\d+ \[[^\]]""".r
    val uncorrelated = """scalar-subquery#\d+ \[\]""".r
    for (name <- Seq("q217_having_scalar_subquery",
        "q219_antijoin_scalar_avg_dispatch")) {
      val df = SparkEntry.queries(name)(spark, sf001)
      df.collect()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(correlated.findFirstIn(optimized).isEmpty, s"$name:\n$optimized")
      assert(uncorrelated.findAllIn(optimized).size == 1, s"$name:\n$optimized")
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"), s"$name:\n$physical")
    }
  }

  test("q218 rewrites the IN chain to semi joins and decorrelates the inner SUM") {
    val df = SparkEntry.queries("q218_in_correlated_agg_chain")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"), optimized)
    assert(optimized.contains("LeftSemi"), optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Subquery"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
  }

  test("q219 anti-joins the NOT EXISTS (left-anti, never a per-row probe)") {
    val df = SparkEntry.queries("q219_antijoin_scalar_avg_dispatch")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftAnti"), optimized)
  }

  test("q205 decorrelates the scalar-aggregate subquery (no per-row probe)") {
    // RewriteCorrelatedScalarSubquery must turn the correlated avg()
    // into an aggregate joined back on l_partkey: the optimized plan
    // carries no scalar-subquery expression and the physical plan no
    // subquery stage — a surviving per-row probe would be an O(rows)
    // re-scan of lineitem at 100 TB
    val df = SparkEntry.queries("q205_correlated_scalar_agg")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"), optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Subquery"), physical)
    assert(physical.contains("Join"), physical)
  }

  test("q230 plans the date-correlated EXISTS as ONE left-semi join") {
    // the EXISTS correlates on o_orderkey AND the outer o_orderdate;
    // both must fold into a single semi join (key equality + date
    // residual) — a surviving subquery would probe lineitem per order
    val df = SparkEntry.queries("q230_exists_priority_census")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Subquery"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
  }

  test("q236 plans NOT IN as a left-anti hash join (no BNLJ fallback)") {
    // NOT IN is null-aware: with a nullable probe column Spark can
    // only run it as a BroadcastNestedLoopJoin — this gate pins that
    // the non-null s_suppkey lets the planner keep a hash anti join,
    // the only shape that survives a 100 TB probe side
    val df = SparkEntry.queries("q236_notin_supplier_census")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftAnti"), optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
  }

  test("q237 runs the HAVING aggregate once, joined semi (TPC-H Q18 shape)") {
    val df = SparkEntry.queries("q237_big_order_customers")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Subquery"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
  }

  test("q238 keeps the equi hash join under the OR-of-ANDs (TPC-H Q19 shape)") {
    // Catalyst must extract the common p_partkey = l_partkey from the
    // disjunction so the join is hash on the key with the OR as a
    // residual — the disjunction AS the join condition would plan a
    // nested loop over lineitem x part
    val df = SparkEntry.queries("q238_disjunctive_pushdown")(spark, sf001)
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
    assert(physical.contains("Join"), physical)
  }

  test("q244 pushes all three predicates into the parquet scan (TPC-H Q6 shape)") {
    // the no-join filter aggregate lives or dies on scan pushdown: at
    // 100 TB the date band must prune row groups, not filter post-read
    val df = SparkEntry.queries("q244_forecast_revenue_delta")(spark, sf001)
    df.collect()
    // executedPlan.toString ELIDES long PushedFilters lists with "..." —
    // formatted explain prints them in full
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters"), formatted)
    for (p <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(formatted.contains(p), s"missing pushed filter $p:\n$formatted")
  }

  test("q245 pushes the LIKE into the part scan, keeps equi hash joins (Q9 shape)") {
    val df = SparkEntry.queries("q245_product_profit_by_nation")(spark, sf001)
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("StringContains(p_name,red)"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
  }

  test("q239 executes the revenue-view MAX as one uncorrelated scalar") {
    val correlated = """scalar-subquery#\d+ \[[^\]]""".r
    val uncorrelated = """scalar-subquery#\d+ \[\]""".r
    val df = SparkEntry.queries("q239_max_revenue_supplier")(spark, sf001)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(correlated.findFirstIn(optimized).isEmpty, optimized)
    assert(uncorrelated.findAllIn(optimized).size == 1, optimized)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
  }
}
