package graft.cta

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** CTA "Public Transit Status" pipeline (reference
  * `kafka-streaming-pipeline/`), as typed Spark transforms.
  */

/** Postgres `stations` row (reference load_stations.sql:1-12). */
case class Station(
    stop_id: Int,
    direction_id: String,
    stop_name: String,
    station_name: String,
    station_descriptive_name: String,
    station_id: Int,
    order: Int,
    red: Boolean,
    blue: Boolean,
    green: Boolean)

/** Faust TransformedStation (reference consumers/faust_stream.py:25-29). */
case class TransformedStation(
    station_id: Int,
    station_name: String,
    order: Int,
    line: String)

object Cta {

  /** Faust agent equivalent (consumers/faust_stream.py:50-71): derive the
    * line color from the boolean columns, reshape 10 fields -> 4. A pure
    * narrow projection — no shuffle, fully codegen'd. */
  def transformStations(stations: DataFrame): DataFrame =
    stations.select(
      col("station_id"),
      col("station_name"),
      col("order"),
      when(col("red"), lit("red"))
        .when(col("blue"), lit("blue"))
        .when(col("green"), lit("green"))
        .otherwise(lit("")).as("line"))

  def transformStationsTyped(stations: Dataset[Station]): Dataset[TransformedStation] = {
    val spark = stations.sparkSession
    import spark.implicits._
    transformStations(stations.toDF()).as[TransformedStation]
  }

  /** KSQL turnstile summary (consumers/ksql.py:16-32): COUNT(*) per
    * station with the UPPERCASE output contract {STATION_ID, COUNT}.
    * On a stream run it in update mode (changelog semantics). */
  def turnstileSummary(turnstiles: DataFrame): DataFrame =
    turnstiles
      .groupBy(col("station_id").as("STATION_ID"))
      .agg(count(lit(1)).as("COUNT"))

  /** JSON serialization of the summary for the changelog topic (K6):
    * key = station id, value = uppercase-field JSON. */
  def turnstileSummaryToKafka(summary: DataFrame): DataFrame =
    summary.selectExpr(
      "CAST(STATION_ID AS STRING) AS key",
      "to_json(struct(STATION_ID, COUNT)) AS value")

  /** Faust-table last-write-wins upsert, batch analog (A2): latest row
    * per key by a monotone ordering column. Delegates to the single
    * implementation in [[graft.streaming.StatefulOps.latestPerKey]]. */
  def latestPerKey(df: DataFrame, key: String, ord: String): DataFrame =
    graft.streaming.StatefulOps.latestPerKey(df, key, ord)

  /** J2: the web consumer's per-station UI state — turnstile summary
    * keyed back into the transformed-stations dim (reference
    * consumers/models/line.py:48-55,68-75 maintains this as a mutable
    * dict; here it's a broadcast-dim left join so stations with no
    * turnstile events yet still render, count defaulting to 0 like the
    * UI's initial state (station.py:24). */
  def stationStatus(transformed: DataFrame, summary: DataFrame): DataFrame =
    transformed.join(
        broadcast(summary),
        transformed("station_id") === summary("STATION_ID"),
        "left")
      .select(
        transformed("station_id"), col("station_name"), col("order"), col("line"),
        coalesce(col("COUNT"), lit(0L)).as("num_turnstile_entries"))

  /** Latest arrival per station (reference consumers/models/station.py
    * keeps `arriving_train` as mutable last-value state; here it's the
    * A2 latest-per-key aggregate over the arrivals stream, keyed on the
    * arrival event key timestamp). Expects decoded arrival columns +
    * a monotone `ts` ordering column. */
  def latestArrivals(arrivals: DataFrame): DataFrame =
    latestPerKey(arrivals, "station_id", "ts")

  /** Last weather reading (reference consumers/weather.py keeps one
    * global latest value): single-group max_by over the stream. */
  def latestWeather(weather: DataFrame): DataFrame =
    weather.agg(
      max(col("ts")).as("ts"),
      max_by(col("temperature"), col("ts")).as("temperature"),
      max_by(col("status"), col("ts")).as("status"))

  /** A4: first-row extraction after an equality filter (reference
    * turnstile_hardware.py:22-33 `iloc[0]` pattern). */
  def firstRowFor(df: DataFrame, keyCol: String, key: Int, orderCol: String): Option[org.apache.spark.sql.Row] =
    df.filter(col(keyCol) === key).orderBy(col(orderCol)).limit(1)
      .collect().headOption

  /** Stations CSV batch source (S5; reference producers/simulation.py:35-37
    * reads the same file with pandas), ordered by `order` (O1). */
  def readStationsCsv(spark: SparkSession, path: String): Dataset[Station] = {
    import spark.implicits._
    spark.read
      .option("header", "true")
      .schema(implicitly[org.apache.spark.sql.Encoder[Station]].schema)
      .csv(path)
      .as[Station]
      .orderBy(col("order"))
      .as[Station]
  }
}
