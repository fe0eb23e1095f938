package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union analytics — the sweep-line "merge overlapping
  * intervals" pass, as window algebra: per key, total covered length
  * and island count of a set of (possibly overlapping) intervals.
  * The usage-metering / uptime / session-coverage primitive that a
  * naive SUM(end - start) double-counts.
  *
  * Shape: one window pass computes each interval's relation to the
  * running max end of everything before it (island-start flag), a
  * second running sum numbers the islands, and a grouped agg folds
  * island extents. Everything partitions by the key — nothing global
  * — and per-key cost is a sort of that key's intervals: the same
  * posture as q141's SCD2 build. All arithmetic on integer epoch
  * units — exact in any engine.
  */
object Intervals {

  /** Per-key union coverage of [startCol, endCol) integer intervals.
    * `ordCol` breaks start ties deterministically (any unique id).
    * Output: key, n_islands, covered (sum of merged island lengths). */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, ordCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(ordCol))
    val prevMax = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("_new_island",
        when(prevMax.isNull || col(startCol) > prevMax, 1).otherwise(0))
      .withColumn("_island", sum(col("_new_island")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(keyCol), col("_island"))
      .agg((max(col(endCol)) - min(col(startCol))).as("_len"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"), sum(col("_len")).as("covered"))
  }
}
