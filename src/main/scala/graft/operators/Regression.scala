package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary least squares — trend detection over keyed
  * series (is each event type's value drifting up or down?) as ONE
  * aggregation pass: OLS needs only the moment sums (n, Σx, Σy, Σxy,
  * Σx²), which partial-aggregate map-side and merge associatively, so
  * 100 TB of series regress in a single shuffle on the group key with
  * no per-group sort and no iteration.
  *
  * Exactness: for integer x and y the slope is the exact rational
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  * — numerator and denominator are emitted as BIGINTs (bit-portable
  * to any engine), and the one double (`slope`) is a single division
  * of those exact integers, IEEE-identical everywhere. Callers scale
  * inputs so the moment products stay inside int64 (e.g. hours since
  * group min × value millis — see q156); at larger magnitudes the
  * drop-in is DECIMAL(38,0) sums, same shape.
  */
object Regression {

  /** Regress integer `yCol` on integer `xCol` within each `groupCol`.
    * Output per group: n_rows, sum_x, sum_y, slope_num, slope_den,
    * slope (double). A vertical group (all x equal) yields
    * slope_den = 0 and slope = NULL (`try_divide` — ANSI mode raises
    * on ANY zero divisor, doubles included); callers detect the
    * degenerate fit on either column. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame =
    slopesFromMoments(moments(df, groupCol, xCol, yCol), groupCol)

  /** The per-group moment sums (n, Σx, Σy, Σxy, Σx²) — the operator's
    * whole state, and the unit of incremental merge: moments of a
    * union are the elementwise SUMS of the parts' moments, so
    * [[graft.streaming.MomentStore]] folds batch moments into a
    * durable store with plain addition and zero approximation. */
  def moments(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
  }

  /** Finish the fit from (possibly merged) moment sums. */
  def slopesFromMoments(m: DataFrame, groupCol: String): DataFrame =
    m.select(col(groupCol), col("n_rows"), col("sum_x"), col("sum_y"),
        (col("n_rows") * col("sxy") - col("sum_x") * col("sum_y")).as("slope_num"),
        (col("n_rows") * col("sxx") - col("sum_x") * col("sum_x")).as("slope_den"))
      .withColumn("slope",
        try_divide(col("slope_num").cast("double"), col("slope_den").cast("double")))
}
