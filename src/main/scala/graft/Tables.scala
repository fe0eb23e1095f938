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

  /** Older testdata generations stored events.ts as INT64
    * TIMESTAMP(NANOS), which Spark's parquet reader rejects unless the
    * legacy conf reads nanos as plain long; [[eventsTsFix]] then surfaces
    * a proper micro-precision TimestampType column. Current generations
    * store ts as timestamp[us] without a zone (read as TIMESTAMP_NTZ),
    * which only needs a cast to the session-UTC TimestampType to keep
    * downstream epoch arithmetic identical to the legacy path.
    * [[normalizeEventsTs]] branches on the dtype the reader actually
    * produced, so a testdata regeneration in either direction stays a
    * loud no-op here instead of 12 dead queries. NOTE: the nanos conf is
    * a session-wide switch (there is no per-read option for it) — it is
    * now set only on the legacy branch; both batch and streaming readers
    * share this one recipe. */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  val eventsTsFix: String = "timestamp_micros(ts div 1000)"

  /** Surface `ts` as session-UTC TimestampType regardless of how the
    * parquet stored it (legacy INT64-nanos-as-long vs timestamp[us]).
    * Any OTHER dtype is a testdata-contract break and fails loudly here
    * — a blanket cast would turn e.g. a string-typed regen into silent
    * nulls downstream instead of a one-line diagnosis. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr(eventsTsFix))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts loaded as $other — expected legacy INT64-nanos (long), " +
          "timestamp, or timestamp_ntz; the testdata generation changed " +
          "format (see TESTDATA.md / TablesSchemaSpec)")
    }
  }

  /** The legacy-generation signature: Spark refuses INT64
    * TIMESTAMP(NANOS) parquet with `ILLEGAL_PARQUET_TYPE` (matched by
    * error class first; the NANOS message substring is kept as a
    * fallback for error-class drift across Spark versions). A false
    * positive here (some other illegal type) is safe: the retry under
    * the nanos conf fails identically and that exception propagates. */
  private[graft] def isLegacyNanos(e: org.apache.spark.sql.AnalysisException): Boolean =
    e.getCondition == "ILLEGAL_PARQUET_TYPE" ||
      (e.getMessage != null && e.getMessage.contains("NANOS"))

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val path = s"$sfDir/$name.parquet"
      val raw =
        try spark.read.parquet(path)
        catch {
          // Legacy generation: INT64 TIMESTAMP(NANOS) footer — only
          // readable with the session-wide nanos-as-long conf. Assumes a
          // generation is all-or-nothing per directory: schema inference
          // samples one footer, so a directory MIXING legacy-nanos and
          // timestamp[us] files could pass here and then fail on
          // executors wrapped in SparkException (not catchable as
          // AnalysisException). The driver regenerates whole directories
          // atomically, so mixed generations cannot occur.
          case e: org.apache.spark.sql.AnalysisException if isLegacyNanos(e) =>
            enableNanosAsLong(spark)
            spark.read.parquet(path)
        }
      normalizeEventsTs(raw)
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` text can mix with
    * the DataFrame DSL over the same logical plans (SURVEY.md §3.1 keeps
    * this semantics from the reference's temp-view usage). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
