package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-replay streaming source (SURVEY.md §2.1 S8): the driver's
  * `events` table stands in for the reference's Kafka topics in
  * streaming tests — a parquet directory replayed as a stream with the
  * same schema the batch path sees (`graft.Tables`).
  */
object Replay {

  /** Events schema with `ts` as the given type — legacy generations
    * store INT64 nanos (read as long under the legacy conf), current
    * ones timestamp[us] (read as TIMESTAMP_NTZ); see graft.Tables. */
  def eventsRawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet DIRECTORY (Spark's file stream
    * source requires a directory, not a single file). The file stream
    * source needs an explicit schema, so probe the stored `ts` dtype
    * with a one-off batch footer read (driver-side, metadata only),
    * then normalize via the same recipe as the batch loader
    * (graft.Tables — incl. its note on the session-wide legacy conf).
    * An initially-EMPTY replay directory (stream started before any
    * file lands — the normal streaming bootstrap) has no footer to
    * probe; default to the current generation's timestamp[us] dtype.
    *
    * OPERATOR NOTE on that empty-dir default: if the first files that
    * later land are LEGACY INT64-nanos parquet, every micro-batch read
    * fails (the nanos-recovery branch runs at probe time only, and a
    * running file stream cannot re-pin its schema). The remedy is to
    * restart the stream once a file exists — the probe then sees the
    * real footer and pins the legacy dtype. This is the documented
    * trade: re-probing inside the stream on first-batch failure would
    * put a schema mutation on the hot path of every healthy stream to
    * heal a bootstrap-only, restart-fixable corner. */
  def eventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    val storedTs =
      try spark.read.parquet(eventsDir).schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if graft.Tables.isLegacyNanos(e) =>
          graft.Tables.enableNanosAsLong(spark)
          spark.read.parquet(eventsDir).schema("ts").dataType
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
          TimestampNTZType
      }
    graft.Tables.normalizeEventsTs(
      spark.readStream
        .schema(eventsRawSchema(storedTs))
        .parquet(eventsDir))
  }

  /** S8: synthetic rate source (the reference's simulation loop analog
    * for load tests — `rowsPerSecond` monotonically-timestamped rows). */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** F4 topic-router as a partitioned file sink: one directory per
    * route value (batch flavor; streaming uses foreachBatch + same
    * write). The streaming-native alternative is N filtered sinks. */
  def routedWrite(df: DataFrame, routeCol: String, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(routeCol).parquet(outDir)
}
