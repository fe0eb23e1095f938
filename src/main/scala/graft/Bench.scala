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
  *  - two passes per query, minimum reported: single-JVM timings on a
  *    shared host see multi-second noise spikes (observed up to 40x on
  *    an otherwise-idle box); min-of-2 reports steady-state throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")

    warmup(spark, sfDir)

    def timeOnce(q: graft.queries.GraftQuery): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).queryExecution.toRdd.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        None
      }
    }
    // a failed query reports -1.0, never a fast-looking time-to-failure
    val results = SparkEntry.registry.map { q =>
      val t = (timeOnce(q), timeOnce(q)) match {
        case (Some(a), Some(b)) => math.min(a, b)
        case _ => -1.0
      }
      q.name -> t
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
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
