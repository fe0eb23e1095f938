package graft.cta

import graft.SparkSpec

/** CTA transforms vs the reference's Faust/KSQL semantics
  * (consumers/faust_stream.py:50-71, consumers/ksql.py:16-32). */
class CtaSpec extends SparkSpec {

  private def stations = {
    import spark.implicits._
    Seq(
      Station(1, "N", "stop-r", "Red Stop", "Red Stop (Red line)", 100, 1, red = true, blue = false, green = false),
      Station(2, "N", "stop-b", "Blue Stop", "Blue Stop (Blue)", 101, 2, red = false, blue = true, green = false),
      Station(3, "N", "stop-g", "Green Stop", "Green", 102, 3, red = false, blue = false, green = true),
      Station(4, "N", "stop-x", "No Line", "none", 103, 4, red = false, blue = false, green = false)
    ).toDS()
  }

  test("transformStations derives line with red>blue>green priority, else empty") {
    import spark.implicits._
    val out = Cta.transformStationsTyped(stations).collect().sortBy(_.station_id)
    assert(out.map(_.line).toSeq == Seq("red", "blue", "green", ""))
    assert(out.head == TransformedStation(100, "Red Stop", 1, "red"))
  }

  test("turnstileSummary counts per station with UPPERCASE contract") {
    import spark.implicits._
    val turnstiles = Seq((100, "A", "red"), (100, "A", "red"), (101, "B", "blue"))
      .toDF("station_id", "station_name", "line")
    val out = Cta.turnstileSummary(turnstiles)
    assert(out.columns.toSeq == Seq("STATION_ID", "COUNT"))
    val m = out.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m == Map(100 -> 2L, 101 -> 1L))
  }

  test("turnstileSummaryToKafka serializes uppercase JSON keyed by station (K6)") {
    import spark.implicits._
    val turnstiles = Seq((100, "A", "red")).toDF("station_id", "station_name", "line")
    val row = Cta.turnstileSummaryToKafka(Cta.turnstileSummary(turnstiles)).collect()(0)
    assert(row.getString(0) == "100")
    assert(row.getString(1) == """{"STATION_ID":100,"COUNT":1}""")
  }

  test("latestPerKey keeps the max-ordinal row per key (A2 upsert)") {
    import spark.implicits._
    val df = Seq((1, 10L, "old"), (1, 20L, "new"), (2, 5L, "only"))
      .toDF("k", "ver", "payload")
    val out = Cta.latestPerKey(df, "k", "ver").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1, 20L, "new"), (2, 5L, "only")))
  }

  test("stationStatus joins summary into the stations dim, 0 for quiet stations (J2)") {
    import spark.implicits._
    val transformed = Cta.transformStations(stations.toDF())
    val turnstiles = Seq((100, "A", "red"), (100, "A", "red"), (101, "B", "blue"))
      .toDF("station_id", "station_name", "line")
    val status = Cta.stationStatus(transformed, Cta.turnstileSummary(turnstiles))
    val m = status.collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(m == Map(100 -> 2L, 101 -> 1L, 102 -> 0L, 103 -> 0L))
  }

  test("firstRowFor returns the first matching row (A4 iloc[0] pattern)") {
    import spark.implicits._
    val df = Seq((7, 2, "second"), (7, 1, "first"), (8, 1, "other"))
      .toDF("station_id", "ord", "v")
    val row = Cta.firstRowFor(df, "station_id", 7, "ord")
    assert(row.exists(_.getString(2) == "first"))
    assert(Cta.firstRowFor(df, "station_id", 99, "ord").isEmpty)
  }

  test("readStationsCsv loads and orders by order column (S5/O1)") {
    val tmp = java.nio.file.Files.createTempDirectory("stations").toFile
    val f = new java.io.File(tmp, "stations.csv")
    val w = new java.io.PrintWriter(f)
    w.println("stop_id,direction_id,stop_name,station_name,station_descriptive_name,station_id,order,red,blue,green")
    w.println("2,N,b,B,Bd,101,2,false,true,false")
    w.println("1,N,a,A,Ad,100,1,true,false,false")
    w.close()
    val ds = Cta.readStationsCsv(spark, f.getAbsolutePath)
    val out = ds.collect()
    assert(out.map(_.station_id).toSeq == Seq(100, 101))
    assert(out.head.red && out(1).blue)
  }
}
