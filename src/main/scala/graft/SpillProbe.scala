package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constrained-memory spill gate (probe side). The 100 TB posture
  * assumes operators SPILL instead of OOM when execution memory runs
  * out, but every spec runs in a roomy sandbox heap where nothing
  * ever spills — graceful degradation was asserted, never exercised.
  * This main runs the heaviest shuffle shapes (global sort, wide hash
  * aggregation, forced sort-merge join) inside whatever heap it was
  * launched with; `SpillGateSpec` forks it at -Xmx400m so the shapes
  * CANNOT fit, and gates (a) spill metrics > 0 — the pressure was
  * real — and (b) every checksum identical to the roomy in-process
  * run — degradation changed nothing but the disk traffic.
  *
  * Checksum design: all content checksums are order-insensitive SUMS
  * of per-row hashes (shifted down so 2^53-scale term counts cannot
  * overflow BIGINT under ANSI mode), so they are independent of
  * partitioning and shuffle.partitions — the two runs deliberately
  * differ in both. Sort correctness needs order, not just content:
  * same multiset + globally sorted on a TOTAL key = identical
  * sequence, so the probe asserts per-partition sortedness plus
  * cross-partition boundary monotonicity and reuses the content sum.
  */
object SpillProbe {

  /** Deterministic heavy fixture: `n` rows, two 32-char digest
    * payloads (incompressible, so size estimates stay honest) and a
    * modular group key. A pure function of (n) — both JVMs generate
    * identical content. */
  def wideRows(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id"),
      md5(col("id").cast("string")).as("p1"),
      md5(concat(lit("x"), col("id").cast("string"))).as("p2"),
      (col("id") % 300000L).as("g"))

  /** Order-insensitive content checksum of the sort input/output:
    * partition-independent by construction. */
  def sortContentSum(df: DataFrame): Long =
    df.agg(sum(shiftright(xxhash64(col("id"), col("p1"), col("p2")), 12)))
      .collect()(0).getLong(0)

  /** Global sort by the total key (p1, id); returns (contentSum,
    * globallySorted). The sortedness proof walks per-partition
    * (first, last, inOrder) triples in partition order on the driver
    * — partition boundaries may differ between runs, monotonicity
    * must not. */
  def globalSort(df: DataFrame): (Long, Boolean) = {
    val sorted = df.orderBy(col("p1"), col("id"))
    val content = sortContentSum(sorted)
    val parts = sorted.select(concat_ws("|", col("p1"), col("id")).as("key"))
      .rdd.mapPartitionsWithIndex { (i, it) =>
        var first: String = null; var last: String = null
        var ordered = true
        it.foreach { r =>
          val k = r.getString(0)
          if (first == null) first = k
          else if (k < last) ordered = false
          last = k
        }
        if (first == null) Iterator.empty
        else Iterator((i, first, last, ordered))
      }.collect().sortBy(_._1)
    val within = parts.forall(_._4)
    val across = parts.sliding(2).forall {
      case Array(a, b) => a._3 <= b._2
      case _ => true
    }
    (content, within && across)
  }

  /** Wide hash aggregation: 300k string-carrying groups, checksummed
    * order-insensitively. */
  def wideAgg(df: DataFrame): Long =
    df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("p1")).as("mn"), max(col("p2")).as("mx"))
      .agg(sum(shiftright(xxhash64(col("g"), col("n"), col("mn"), col("mx")), 12)))
      .collect()(0).getLong(0)

  /** Forced sort-merge self-join (1:1 on id): both sides sort — the
    * shuffle-join shape that must spill, not OOM, under pressure. */
  def smjJoin(df: DataFrame): Long = {
    val a = df.select(col("id"), col("p1"))
    val b = df.select(col("id").as("id2"), col("p2"))
    a.join(b, col("id") === col("id2"))
      .agg(sum(shiftright(xxhash64(col("id"), col("p1"), col("p2")), 12)))
      .collect()(0).getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", "3")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val spilled = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    val df = wideRows(spark, n)
    val (sortSum, sortedOk) = globalSort(df)
    val aggSum = wideAgg(df)
    val joinSum = smjJoin(df)
    // one JSON contract line on stdout; listener events are posted
    // async, so drain the bus before reading the spill counter
    org.apache.spark.GraftListenerBridge
      .waitUntilListenerBusEmpty(spark.sparkContext)
    println(s"""{"n":$n,"sort_sum":$sortSum,"sorted":$sortedOk,""" +
      s""""agg_sum":$aggSum,"join_sum":$joinSum,""" +
      s""""spilled_bytes":${spilled.get()},""" +
      s""""heap_max_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)}}""")
    spark.stop()
  }
}
