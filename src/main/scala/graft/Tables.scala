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

  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects. The legacy conf reads nanos as plain long;
    * [[eventsTsFix]] then surfaces a proper micro-precision
    * TimestampType column (lossless for this data). NOTE: the conf is a
    * session-wide switch (there is no per-read option for it) — it
    * changes how ANY nanos-timestamp parquet column is read in this
    * session; both batch and streaming readers share this one recipe. */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  val eventsTsFix: String = "timestamp_micros(ts div 1000)"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      enableNanosAsLong(spark)
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(eventsTsFix))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` text can mix with
    * the DataFrame DSL over the same logical plans (SURVEY.md §3.1 keeps
    * this semantics from the reference's temp-view usage). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
