package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event log: for a step
  * sequence A, B, C…, a user reaches step k if there exist events of
  * those types at strictly increasing timestamps. The classic product
  * analytics operator Spark has no built-in for.
  *
  * Plan (one shuffle): events shuffle once on the user key; each step's
  * first-reach time is a conditional `min` window over that same user
  * partitioning — step k's condition references step k-1's column, so
  * the windows chain WITHOUT new exchanges (every WindowExec reuses the
  * user hash partitioning). A per-user rollup then collapses to one row
  * per user, and the funnel summary is a tiny global aggregate. No
  * self-joins: a join-per-step formulation would scan the event log
  * once per step and shuffle it each time.
  *
  * Strictly-after semantics (`>`): a step cannot be satisfied by an
  * event at the same timestamp as the previous step's reach time —
  * deterministic regardless of event-id tie order, because reach times
  * are pure mins over the data. */
object Funnel {

  /** Per-user first-reach time per step: (userCol, t1..tN timestamps,
    * reached = number of completed steps). */
  def reach(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    val withTimes = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t$i")
      acc.withColumn(s"t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    val tCols = steps.indices.map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}"))
    val reached = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    withTimes
      .groupBy(col(userCol))
      .agg(tCols.head, tCols.tail: _*)
      .withColumn("reached", reached)
  }

  /** Cohort retention matrix: users grouped by their first-activity
    * week (epoch-week integer — engine-agnostic, no week-start
    * convention), counted in each later week they were active.
    * Returns (cohort_week, week_offset, n_users).
    *
    * Plan: one shuffle on the user key — the cohort week is a `min`
    * window over it, the per-(user, week) dedup reuses the same
    * partitioning (user ⊆ grouping keys), and only the final tiny
    * (cohort, offset) rollup reshuffles aggregated rows. */
  def retention(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    df.select(col(userCol),
        floor(unix_millis(col(tsCol)) / lit(604800000.0)).cast("long").as("week"))
      .withColumn("cohort_week", min(col("week")).over(w))
      .groupBy(col(userCol), col("cohort_week"), col("week"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Funnel summary: one row per step with the user count that reached
    * it (monotonically non-increasing by construction). */
  def counts(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    val r = reach(df, userCol, tsCol, typeCol, steps)
    // coalesce: an ungrouped agg over an EMPTY event log yields null
    // sums — the summary must report 0, not null, per step
    val perStep = steps.indices.map(i =>
      coalesce(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as(s"u${i + 1}"))
    r.agg(perStep.head, perStep.tail: _*)
      .select(posexplode(array(steps.indices.map(i => col(s"u${i + 1}")): _*))
        .as(Seq("step0", "users")))
      .select((col("step0") + 1).cast("long").as("step"), col("users"))
  }
}
