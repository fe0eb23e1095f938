package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Kafka source/sink builders (SURVEY.md §2.1 S1-S3, §2.7 K1/K2/K5/K6).
  *
  * These produce standard streaming DataFrames with binary key/value —
  * the same shape the reference's jobs consume — so every transform in
  * `graft.stedi` / `graft.cta` composes directly. Deployment note: the
  * `kafka` format needs the `spark-sql-kafka-0-10` connector on the
  * classpath (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13`);
  * neither the connector nor a broker ships in this test environment,
  * so unit tests drive the same transforms through `MemoryStream`
  * (identical logical plans downstream of the source).
  */
object KafkaSources {

  /** S1: single-topic subscription, earliest offsets (the reference's
    * only consumption mode: sparkpykafkajoin.py:61-67). */
  def subscribe(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** S2: regex-pattern subscription across per-station topics
    * (consumers/server.py:76-80 `^org.chicago.cta.station.arrivals.`). */
  def subscribePattern(
      spark: SparkSession,
      bootstrap: String,
      pattern: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribePattern", pattern)
      .option("startingOffsets", startingOffsets)
      .load()
}

object KafkaSinks {

  /** K1/K6: Kafka sink; df must have string/binary `key` and `value`. */
  def kafka(
      df: DataFrame,
      bootstrap: String,
      topic: String,
      checkpointLocation: String,
      outputMode: OutputMode = OutputMode.Append()): DataStreamWriter[Row] =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
      .outputMode(outputMode)

  /** K2: console sink (append), the reference's debug sink. */
  def console(df: DataFrame, outputMode: OutputMode = OutputMode.Append()): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(outputMode)

  /** K5: foreachBatch callback sink (consumer message_handler analog). */
  def foreachBatch(
      df: DataFrame,
      checkpointLocation: String,
      outputMode: OutputMode)(
      handler: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch(handler)

  /** In-memory named sink for tests: returns the started query. */
  def memory(df: DataFrame, name: String, outputMode: OutputMode): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
}
