package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("reach: strictly-after ordering, partial funnels, out-of-order events") {
    import spark.implicits._
    val events = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: purchase BEFORE click -> only reaches step 2
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:01:00"), "purchase"),
      (2L, ts("2024-01-01 09:02:00"), "click"),
      // user 3: click at the SAME instant as view -> strict > rejects it
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "click"),
      // user 4: never views
      (4L, ts("2024-01-01 07:00:00"), "click"),
      (4L, ts("2024-01-01 07:01:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.reach(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("counts are monotonically non-increasing and match reach on real events") {
    val e = graft.Tables.table(spark, sf001, "events")
    val steps = Seq("view", "click", "purchase")
    val c = Funnel.counts(e, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(1L) >= c(2L) && c(2L) >= c(3L))
    val reach = Funnel.reach(e, "user_id", "ts", "event_type", steps)
      .select("reached").collect().map(_.getLong(0))
    assert(c(1L) == reach.count(_ >= 1))
    assert(c(3L) == reach.count(_ == 3))
    assert(c(1L) > 0)
  }

  test("retention: cohorts by first week, offsets count distinct active users") {
    import spark.implicits._
    val wk = 604800000L
    def t(week: Long, offMs: Long) = new java.sql.Timestamp(week * wk + offMs)
    val events = Seq(
      (1L, t(2800, 10)), (1L, t(2800, 20)), (1L, t(2802, 0)), // cohort 2800, wks 0,2
      (2L, t(2800, 50)), (2L, t(2801, 0)),                    // cohort 2800, wks 0,1
      (3L, t(2801, 5))                                        // cohort 2801, wk 0
    ).toDF("user_id", "ts")
    val r = Funnel.retention(events, "user_id", "ts")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      (2800L, 0L) -> 2L, (2800L, 1L) -> 1L, (2800L, 2L) -> 1L,
      (2801L, 0L) -> 1L))
  }

  test("funnel plan shuffles the event log exactly once (chained windows, no self-joins)") {
    val e = graft.Tables.table(spark, sf001, "events")
    val plan = Funnel.reach(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }
}
