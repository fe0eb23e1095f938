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

  /** Raw events schema as stored (ts = INT64 nanos; see Tables). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet DIRECTORY (Spark's file stream
    * source requires a directory, not a single file); ts surfaced as
    * TimestampType micros via the same recipe as the batch loader
    * (graft.Tables — incl. its note on the session-wide conf). */
  def eventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    graft.Tables.enableNanosAsLong(spark)
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(eventsDir)
      .withColumn("ts", expr(graft.Tables.eventsTsFix))
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
