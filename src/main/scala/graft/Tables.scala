package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Always plain `spark.read.parquet` — filters and column pruning are left
  * to Catalyst so they reach the scan (`PushedFilters` / `ReadSchema`).
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loader is the one seam where that changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
      // parquet reader rejects; read nanos as long and surface a proper
      // micro-precision TimestampType column (lossless for this data).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` text can mix with
    * the DataFrame DSL over the same logical plans (SURVEY.md §3.1 keeps
    * this semantics from the reference's temp-view usage). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
