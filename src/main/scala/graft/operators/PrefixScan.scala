package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed prefix aggregation — a running total over a GLOBAL sort
  * order without ever collapsing the data into a single-partition
  * window (`sum(...) OVER (ORDER BY ...)` with no PARTITION BY is the
  * plan Spark warns about: every row through one task). The scan
  * primitive behind cumulative revenue curves, budget-consumption
  * cutoffs, and offset assignment.
  *
  * Recipe (the [[SortedNeighborhood.globalRank]] two-pass, generalized
  * from row counts to any associative + commutative integer aggregate):
  * range-repartition by the sort key and sort locally; collect the
  * per-partition TOTALS (a partition-count-sized frame — driver-safe
  * the same way a table format's file manifest is); broadcast the
  * exclusive prefix of those totals back as each partition's offset;
  * then each row's global running value is its partition-local running
  * value plus its partition's offset. Wall-clock rides two scans and
  * one tiny collect; no stage touches more than a partition of data at
  * a time.
  */
object PrefixScan {

  /** Global running sum of `valueCol` (must be integer-typed; sums must
    * fit int64) over the total order `sortCols` (include a unique
    * tiebreaker), as new column `outCol`. Inclusive: a row's running
    * sum includes its own value. The frame is persisted while the
    * per-partition totals are collected, then the result is eagerly
    * materialized before unpersisting (the globalRank lifecycle — a
    * second action must not re-sample different range boundaries). */
  def prefixSum(
      df: DataFrame, sortCols: Seq[Column], valueCol: Column, outCol: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    val sorted = ranged
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_v", valueCol.cast("long"))
      .withColumn("_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = sorted.groupBy(col("_pid")).agg(sum(col("_v")).as("t"))
        .as[(Int, Long)].collect().sortBy(_._1)
      val offsets = totals.map(_._1)
        .zip(totals.scanLeft(0L)(_ + _._2).dropRight(1))
      val offDf = broadcast(offsets.toSeq.toDF("_pid", "_off"))
      val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scanned = sorted.join(offDf, "_pid")
        .withColumn(outCol, sum(col("_v")).over(w) + col("_off"))
        .drop("_pid", "_off", "_v")
      scanned.localCheckpoint(eager = true)
    } finally { sorted.unpersist(); () }
  }
}
