package graft.operators

import org.apache.spark.sql.SparkSession

/** Depth-budget guard for recursive-CTE queries. Spark bounds
  * recursive CTE execution with `spark.sql.cteRecursionLevelLimit`
  * (default 100) and a query that needs more dies MID-QUERY with the
  * engine's generic limit error — after paying for `limit` rounds of
  * shuffles. For recursions whose depth is a cheap function of the
  * data (a key-doubling tree's depth is log2(max key)), the budget
  * can be checked BEFORE round one: one bounded aggregate (max over
  * an indexed/statistics-backed column) against a loud, actionable
  * refusal naming the conf — the difference between failing in
  * milliseconds with instructions and failing after an hour of
  * cluster time at 100 TB.
  */
object RecursionGuard {

  val LimitConf = "spark.sql.cteRecursionLevelLimit"

  /** The session's recursion budget. A malformed session value (a
    * typo'd `spark.conf.set`) refuses LOUDLY, naming the conf and the
    * value — the guard exists to turn mid-query deaths into named
    * pre-flight refusals, so its own parse must not throw a bare
    * NumberFormatException from inside that promise. */
  def cteLevelLimit(spark: SparkSession): Int =
    parseLimit(spark.conf.get(LimitConf, "100"))

  /** The parse itself — a seam, because a session `conf.set` on this
    * REGISTERED int conf already validates at set time; the malformed
    * value this defends against arrives through paths the typed
    * registry never sees (a string-only `--conf` on a build where the
    * entry is not registered, a doctored properties file). */
  private[operators] def parseLimit(raw: String): Int =
    raw.trim.toIntOption.getOrElse(throw new IllegalStateException(
      s"$LimitConf is set to '$raw', which is not an integer — fix the " +
        "session conf before running a depth-guarded recursive query"))

  /** Refuse loudly if `expectedLevels` recursion rounds would not fit
    * the session's CTE recursion budget. `expectedLevels` should
    * count every round the engine will run, INCLUDING the final
    * empty-frontier round that proves termination. */
  def requireDepthBudget(
      spark: SparkSession, expectedLevels: Long, what: String): Unit = {
    val limit = cteLevelLimit(spark)
    if (expectedLevels > limit) throw new IllegalStateException(
      s"$what expects ~$expectedLevels recursion levels but " +
        s"$LimitConf is $limit — raise the conf (spark.conf.set(" +
        s""""$LimitConf", "${expectedLevels + 8}")) or shrink the """ +
        "recursion's key domain; without this pre-check Spark runs " +
        s"$limit full rounds of shuffles and then dies with its " +
        "generic recursion-limit error")
  }

  /** The depth budget of a key-doubling tree walk (children of k are
    * 2k and 2k+1, root 1): floor(log2(maxKey)) + 1 populated levels,
    * plus the final empty round. */
  def doublingTreeLevels(maxKey: Long): Long = {
    require(maxKey >= 1, s"maxKey must be >= 1, got $maxKey")
    (63 - java.lang.Long.numberOfLeadingZeros(maxKey)) + 2L
  }
}
