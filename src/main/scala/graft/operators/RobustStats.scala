package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — median/MAD instead of
  * mean/stddev, so a heavy-tailed metric (latency, spend, doc length)
  * doesn't let the outliers drag the threshold toward themselves: the
  * breakdown point of the median is 50%, of the mean 0%.
  *
  * ALL arithmetic is integer-exact in doubled units so the flag is
  * bit-portable across engines: for integer inputs x, 2*median(x) is
  * always integral (interpolated median = (a+b)/2), so
  *   med2  = 2*median(x)            (exact BIGINT)
  *   a2    = |2*x - med2|           (= 2*|x - median|, exact)
  *   mad2a = 2*median(a2)           (= 4*MAD, exact)
  * and the k-sigma-equivalent rule |x - median| > k*MAD becomes the
  * pure-integer comparison 2*a2 > k*mad2a — no float compare anywhere,
  * so there is no summation-order or representation lottery between
  * Spark and a SQL oracle.
  *
  * Scale: two grouped EXACT medians. Spark's `percentile` aggregates
  * a per-group value histogram — memory rides the number of DISTINCT
  * values per group, not rows. For a genuinely unbounded-cardinality
  * metric at 100 TB the drop-in is `percentile_approx` with the
  * q118-style rank-error gate; the operator's flag rule is unchanged.
  * Both medians shuffle on the SAME group key, and the final join
  * broadcasts the (one row per group) thresholds.
  */
object RobustStats {

  /** Rows of `df` whose integer metric `valueCol` deviates from its
    * group median by more than `k` MADs. Output: the input columns
    * plus `a2` (2*|x-median|) and `mad2a` (4*MAD) audit columns. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 3): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(round(expr(s"2 * percentile($valueCol, 0.5)")).cast("long").as("med2"))
    val a = df.join(broadcast(med), Seq(groupCol))
      .withColumn("a2", abs(lit(2) * col(valueCol) - col("med2")))
    val mad = a.groupBy(col(groupCol))
      .agg(round(expr("2 * percentile(a2, 0.5)")).cast("long").as("mad2a"))
    a.join(broadcast(mad), Seq(groupCol))
      .filter(lit(2) * col("a2") > lit(k) * col("mad2a"))
      .drop("med2")
  }
}
