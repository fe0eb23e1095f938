package graft.cta

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StatefulOps

/** The CTA topology end-to-end over MemoryStream (reference §3.2-§3.3):
  * stations stream -> Faust-style transform -> latest-per-key table;
  * turnstile stream -> KSQL-style count; both joined into the web
  * consumer's station-status view. */
class CtaEndToEndSpec extends SparkSpec {

  test("stations transform + turnstile counts compose into station status") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stationsIn = MemoryStream[Station]
    val turnstilesIn = MemoryStream[(Int, String, String)]

    // Faust-equivalent: per-record transform, latest row per station key
    val transformed = Cta.transformStations(stationsIn.toDF())
    val latest = StatefulOps.latestPerKey(transformed, "station_id", "order")

    val q1 = latest.writeStream.format("memory").queryName("stations_tbl")
      .outputMode("complete").start()
    // KSQL-equivalent: COUNT(*) per station, uppercase contract
    val counts = Cta.turnstileSummary(
      turnstilesIn.toDF().toDF("station_id", "station_name", "line"))
    val q2 = counts.writeStream.format("memory").queryName("turnstile_tbl")
      .outputMode("complete").start()
    try {
      stationsIn.addData(
        Station(1, "N", "s1", "Alpha", "Alpha (Red)", 100, 1, red = true, blue = false, green = false),
        Station(2, "N", "s2", "Beta", "Beta (Blue)", 101, 2, red = false, blue = true, green = false))
      turnstilesIn.addData((100, "Alpha", "red"), (100, "Alpha", "red"))
      q1.processAllAvailable(); q2.processAllAvailable()

      // updated station row arrives (station renamed) -> table upserts
      stationsIn.addData(
        Station(1, "N", "s1", "Alpha2", "Alpha2 (Red)", 100, 3, red = true, blue = false, green = false))
      turnstilesIn.addData((101, "Beta", "blue"))
      q1.processAllAvailable(); q2.processAllAvailable()

      val status = Cta.stationStatus(
        spark.table("stations_tbl"), spark.table("turnstile_tbl"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(3), r.getLong(4))).toSet
      assert(status == Set(
        (100, "Alpha2", "red", 2L),
        (101, "Beta", "blue", 1L)))
    } finally { q1.stop(); q2.stop() }
  }

  test("latest arrival per station and last weather reading (UI last-value state)") {
    import spark.implicits._
    val arrivals = Seq(
      (100, "T1", "a", "red", "in_service", 1000L),
      (100, "T2", "b", "red", "in_service", 2000L),
      (101, "T3", "a", "blue", "broken_down", 1500L)
    ).toDF("station_id", "train_id", "direction", "line", "train_status", "ts")
    val latest = Cta.latestArrivals(arrivals).collect()
      .map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(latest == Map(100 -> "T2", 101 -> "T3"))

    val weather = Seq((70.1f, "sunny", 1000L), (65.2f, "windy", 3000L))
      .toDF("temperature", "status", "ts")
    val w = Cta.latestWeather(weather).collect()(0)
    assert(w.getFloat(1) == 65.2f && w.getString(2) == "windy")
  }
}
