package graft

import org.apache.spark.sql.functions._

/** [[Bench.planStats]] is the drift-immune bench signal: exchange
  * count and shuffle/scan row counts of the EXECUTED final plan are
  * functions of (code, data), not of ambient host load. These specs
  * pin the walker's semantics on known plans — through AQE wrappers,
  * broadcast vs shuffle discrimination, and determinism across runs.
  */
class PlanStatsSpec extends SparkSpec {

  private def statsOf(df: org.apache.spark.sql.DataFrame): Bench.PlanStats = {
    val qe = df.queryExecution
    qe.toRdd.count() // metrics exist only after execution
    Bench.planStats(qe)
  }

  test("a shuffled groupBy counts its exchange and its shuffle rows") {
    val li = Tables.table(spark, sf001, "lineitem")
      .select("l_returnflag", "l_quantity")
    val agg = li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    val s = statsOf(agg)
    assert(s.exchanges == 1L, s)
    // partial aggregation runs map-side, so the exchange carries one
    // row per (flag, map partition) at most — far fewer than the scan
    assert(s.shuffleRows > 0L && s.shuffleRows < li.count(), s)
    assert(s.scanRows == li.count(), s)
  }

  test("a broadcast join counts a broadcast, not an exchange") {
    val li = Tables.table(spark, sf001, "lineitem").select("l_orderkey")
    val n = Tables.table(spark, sf001, "nation").select("n_nationkey")
    val j = li.join(broadcast(n), col("l_orderkey") % 25 === col("n_nationkey"))
    val s = statsOf(j)
    assert(s.broadcasts == 1L, s)
    assert(s.exchanges == 0L, s)
    assert(s.scanRows == li.count() + n.count(), s)
  }

  test("plan stats are identical across repeated runs (drift-immunity)") {
    def run() = statsOf(
      Tables.table(spark, sf001, "orders")
        .join(Tables.table(spark, sf001, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s")))
    val a = run(); val b = run()
    assert(a == b, s"$a vs $b")
    assert(a.scanRows > 0L && a.shuffleRows > 0L)
  }

  test("a scalar subquery's plan is walked too") {
    val o = Tables.table(spark, sf001, "orders")
    o.createOrReplaceTempView("pso")
    val df = spark.sql(
      "SELECT o_orderkey FROM pso WHERE o_totalprice > (SELECT avg(o_totalprice) FROM pso)")
    val s = statsOf(df)
    // both the outer scan and the subquery's scan must be visible
    assert(s.scanRows >= 2L * o.count(), s)
  }

  test("scale-drift gate: a deliberately quadratic curve trips it; q143's " +
      "pinned superlinear exponent and ambient noise pass") {
    // committed exponents: q143's documented superlinear shuffle
    // (degree-ordered wedge fan-out, ~1.3 across a 10x data step) and
    // two ordinary queries
    val committed = Map(
      "q143_triangles" -> 1.30,
      "q1_agg" -> 0.70,
      "q24_near_dups" -> 1.80)
    // a query that WAS linear-ish and turned quadratic: the 10x ratio
    // jumps from ~5 to ~100 (exponent 0.7 -> 2.0) — must flag
    val quad = Map("q1_agg" -> Bench.ScaleStat(0.10, 10.0))
    val flagged = Bench.scaleDrift(committed, quad)
    assert(flagged.size == 1 && flagged.head.startsWith("q1_agg"),
      flagged.toString)
    // q143 re-measured at its pinned curve (+ambient wobble under the
    // 0.35 tolerance) passes; so does a query that got FLATTER; so
    // does a query with no committed exponent (first appearance)
    val ok = Map(
      "q143_triangles" -> Bench.ScaleStat(0.31, 9.3), // exponent ~1.48
      "q24_near_dups" -> Bench.ScaleStat(0.50, 5.0),  // flatter: 1.0
      "q_brand_new" -> Bench.ScaleStat(0.01, 10.0))   // no baseline
    assert(Bench.scaleDrift(committed, ok).isEmpty,
      Bench.scaleDrift(committed, ok).toString)
    // exactly at the committed exponent: never flags (strict increase)
    assert(Bench.scaleDrift(
      Map("q" -> 1.0), Map("q" -> Bench.ScaleStat(0.1, 1.0))).isEmpty)
  }
}
