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
}
