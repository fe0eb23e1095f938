package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology:
  *  - one generic warmup (parquet scan + shuffle + window + codegen)
  *    so JIT/class-loading of engine machinery isn't billed to the
  *    first query;
  *  - each query is executed fully materialized via
  *    `queryExecution.toRdd.count()` — a plain Dataset.count() would
  *    let the optimizer prune projections and sorts, under-reporting
  *    the real work;
  *  - two INTERLEAVED full-suite passes (pass 1 runs every query, then
  *    pass 2 runs every query again), per-query minimum reported.
  *    Back-to-back repeats of the same query share any sustained host
  *    interference window, so min-of-2 can't reject it; interleaving
  *    puts the two samples of each query minutes apart, so a noise
  *    window poisons at most one pass of any query.
  *  - per-pass times (`passes`) and per-pass wall-clock start
  *    timestamps in epoch millis (`starts`) go to STDERR as their own
  *    JSON line, so a contaminated window is self-identifying: slow
  *    queries whose start times cluster in one contiguous wall-clock
  *    interval while their other pass is fast indicate host
  *    interference, not a code regression (the BENCH_r02/r03
  *    signature). They must NOT ride on the stdout contract line: the
  *    driver stores only the LAST ~2000 chars of captured output
  *    (every BENCH_r0N.json tail is exactly 2000 chars), and sbt's
  *    `[info] ` prefix plus its trailing `[success] Total time` line
  *    (~85 chars) eat into that window too. 63 full query names at
  *    full double precision is ~2.9 KB — never fit, in ANY round. So
  *    the stdout contract line uses the `qNN` prefix of each query
  *    name as its key and 3-decimal values (~0.9 KB, room to double
  *    the registry), exactly the `{"queries":{"q1":sec,…}}` shape the
  *    contract specifies; the full-name full-precision map rides a
  *    stderr diag line for human reading.
  */
object Bench {
  private final case class Sample(sec: Double, startMs: Long, ok: Boolean)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")

    warmup(spark, sfDir)

    def timeOnce(q: graft.queries.GraftQuery): Sample = {
      val startMs = System.currentTimeMillis()
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).queryExecution.toRdd.count()
        Sample((System.nanoTime() - t0) / 1e9, startMs, ok = true)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        Sample(-1.0, startMs, ok = false)
      }
    }

    val registry = SparkEntry.registry
    val pass1 = registry.map(q => q.name -> timeOnce(q))
    val pass2 = registry.map(q => q.name -> timeOnce(q))
    val byName1 = pass1.toMap
    val byName2 = pass2.toMap

    // a failed query reports -1.0, never a fast-looking time-to-failure
    val results = registry.map { q =>
      val (a, b) = (byName1(q.name), byName2(q.name))
      val t =
        if (a.ok && b.ok) math.min(a.sec, b.sec)
        else if (a.ok) a.sec
        else if (b.ok) b.sec
        else -1.0
      q.name -> t
    }

    def fmt3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // "q13_customers_without_orders" -> "q13"; names are qNN_-prefixed so
    // prefixes are unique — guard anyway and fall back to the full name
    val shortKeys = results.map { case (k, _) => k -> k.takeWhile(_ != '_') }.toMap
    val useShort = shortKeys.values.toSet.size == shortKeys.size
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v) =>
      "\"" + (if (useShort) shortKeys(k) else k) + "\":" + fmt3(v)
    }.mkString("{", ",", "}")
    val passes = registry.map { q =>
      "\"" + q.name + "\":[" + byName1(q.name).sec + "," + byName2(q.name).sec + "]"
    }.mkString("{", ",", "}")
    val starts = registry.map { q =>
      "\"" + q.name + "\":[" + byName1(q.name).startMs + "," + byName2(q.name).startMs + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // diagnostics first, on stderr — never on the stdout contract line
    System.err.println(s"""{"diag":"bench_full_names","queries":$qsFull}""")
    System.err.println(s"""{"diag":"bench_passes","passes":$passes,"starts":$starts}""")
    println(s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Exercise scan/shuffle/window/codegen paths once, cheaply. */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    try {
      val n = Tables.table(spark, sfDir, "nation")
      n.groupBy(col("n_regionkey")).count().queryExecution.toRdd.count()
      // partitioned window: an unpartitioned orderBy would both run
      // single-task and spam the WindowExec warning into the bench tail
      spark.range(1000)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("id") % 8).orderBy(col("id"))))
        .queryExecution.toRdd.count()
    } catch { case _: Throwable => () }
  }
}
