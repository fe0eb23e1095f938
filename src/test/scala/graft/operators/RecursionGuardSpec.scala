package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Recursion depth-budget guard: q209's recursive CTE must refuse
  * LOUDLY before round one when the session's
  * `spark.sql.cteRecursionLevelLimit` cannot fit the data's depth —
  * never die mid-query with the engine's generic error after paying
  * for every round under the limit.
  */
class RecursionGuardSpec extends SparkSpec {

  test("doublingTreeLevels: exact budget for the key-doubling walk") {
    // root-only tree: 1 populated level + the empty terminating round
    assert(RecursionGuard.doublingTreeLevels(1L) == 2L)
    // keys up to 7 -> depths 0,1,2 populated -> 3 + 1
    assert(RecursionGuard.doublingTreeLevels(7L) == 4L)
    assert(RecursionGuard.doublingTreeLevels(8L) == 5L)
    assert(RecursionGuard.doublingTreeLevels(Long.MaxValue) == 64L)
  }

  test("a malformed (non-integer) limit value refuses naming the conf and the value") {
    // a session conf.set on the registered int conf validates at set
    // time, so the malformed value is fed to the parse seam directly —
    // the path a string-only --conf or properties file would take
    val e = intercept[IllegalStateException] {
      RecursionGuard.parseLimit("10O") // the typo'd-set case
    }
    // the guard's own parse must keep the guard's promise: a named
    // refusal, never a bare NumberFormatException from inside it
    assert(e.getMessage.contains(RecursionGuard.LimitConf), e.getMessage)
    assert(e.getMessage.contains("'10O'"), e.getMessage)
    assert(RecursionGuard.parseLimit(" 42 ") == 42)
  }

  test("q209 refuses at an insufficient limit, naming the conf, before any round") {
    val s = spark.newSession() // isolated SQLConf
    s.conf.set(RecursionGuard.LimitConf, "5") // sf0.001's tree is deeper
    val e = intercept[IllegalStateException] {
      SparkEntry.queries("q209_recursive_cte")(s, sf001)
    }
    assert(e.getMessage.contains(RecursionGuard.LimitConf), e.getMessage)
    assert(e.getMessage.contains("recursion levels"), e.getMessage)
  }

  test("q209 runs unchanged when the budget fits (and the guard is exact-ish)") {
    val s = spark.newSession()
    // the depth the guard computed must actually suffice: pin the conf
    // to EXACTLY the computed budget and the query must complete
    val maxKey = graft.Tables.table(s, sf001, "orders")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("o_orderkey")))
      .collect()(0).getLong(0)
    val budget = RecursionGuard.doublingTreeLevels(maxKey)
    s.conf.set(RecursionGuard.LimitConf, budget.toString)
    val rows = SparkEntry.queries("q209_recursive_cte")(s, sf001).collect()
    assert(rows.nonEmpty)
    // depths seen == populated levels (budget minus the empty round)
    assert(rows.length.toLong == budget - 1, s"depths ${rows.length}, budget $budget")
  }
}
