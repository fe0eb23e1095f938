package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.stedi.Stedi

/** §2.8 state-semantics evidence: the reference's no-watermark
  * stream-stream join keeps ALL rows of both sides in the state store
  * forever (sparkpykafkajoin.py:128-130); the watermarked variant
  * bounds state. Both behaviors observed via stateOperators metrics. */
class StreamStateSpec extends SparkSpec {

  private def riskJson(email: String) =
    s"""{"customer":"$email","score":"1.0","riskDate":"2020-01-01T00:00:00.000Z"}"""

  test("no-watermark stream-stream join accumulates state monotonically (J1 parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val riskIn = MemoryStream[(String, String)]
    val custIn = MemoryStream[(String, String)]
    val risk = Stedi.customerRisk(riskIn.toDF().toDF("key", "value"))
    // customers side: already-decoded (email, birthYear) shape
    val cust = custIn.toDF().toDF("email", "birthYear")
    val joined = Stedi.joinRiskWithCustomers(risk, cust)

    val q = joined.writeStream.format("memory").queryName("state_join")
      .outputMode("append").start()
    def stateRows: Long = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsTotal)).maxOption.getOrElse(0L)
    try {
      riskIn.addData(("k", riskJson("a@x.com")))
      custIn.addData(("a@x.com", "1990"))
      q.processAllAvailable()
      val rows1 = stateRows

      riskIn.addData(("k", riskJson("b@x.com")))
      custIn.addData(("b@x.com", "1991"))
      q.processAllAvailable()
      val rows2 = stateRows

      assert(rows2 > rows1, s"state should grow: $rows1 -> $rows2")
      assert(spark.table("state_join").count() == 2)
    } finally q.stop()
  }

  test("watermarked join with time-range condition evicts state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val riskIn = MemoryStream[(java.sql.Timestamp, String, String)]
    val custIn = MemoryStream[(java.sql.Timestamp, String, String)]
    val joined = Stedi.joinRiskWithCustomersWatermarked(
      riskIn.toDF().toDF("ts", "customer", "score"),
      custIn.toDF().toDF("cust_ts", "email", "birthYear"),
      delay = "10 minutes", joinWindow = "10 minutes")

    val q = joined.writeStream.format("memory").queryName("wm_join")
      .outputMode("append").start()
    try {
      riskIn.addData((ts(0), "a@x.com", "1.0"))
      custIn.addData((ts(1), "a@x.com", "1990"))
      q.processAllAvailable()
      // advance the watermark far past the join window, twice (eviction
      // happens the batch after the watermark moves)
      riskIn.addData((ts(48 * 60), "zz@x.com", "9.9"))
      custIn.addData((ts(48 * 60), "zz2@x.com", "1999"))
      q.processAllAvailable()
      riskIn.addData((ts(72 * 60), "zz@x.com", "9.9"))
      custIn.addData((ts(72 * 60), "zz2@x.com", "1999"))
      q.processAllAvailable()

      val totals = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
      assert(totals.nonEmpty)
      assert(totals.last < totals.max,
        s"state should shrink after watermark passes: ${totals.toList}")
      assert(spark.table("wm_join").count() == 1) // only the in-window match
    } finally q.stop()
  }

  test("streaming session windows close and emit after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val in = MemoryStream[(java.sql.Timestamp, Int)]
    val agg = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))

    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1), (ts(10), 1), (ts(120), 1)) // one 2-event session, one 1-event
      q.processAllAvailable()
      in.addData((ts(24 * 60), 99))
      q.processAllAvailable()
      in.addData((ts(48 * 60), 99))
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
        .filter(_.getInt(0) == 1).map(_.getLong(1)).sorted.toList
      assert(rows == List(1L, 2L), s"got $rows")
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys within the watermark window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StatefulOps.dedupStream(
      in.toDF().toDF("ts", "doc"), "ts", "10 minutes", Seq("doc"))

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b"))
      q.processAllAvailable()
      in.addData((ts(3), "a"), (ts(4), "c"))
      q.processAllAvailable()
      val docs = spark.table("dedup_out").collect().map(_.getString(1)).toList
      assert(docs.sorted == List("a", "b", "c"), s"got $docs")
    } finally q.stop()
  }

  test("stream-static join enriches a stream against a batch dimension (J2 shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((100, "Alpha", "red"), (101, "Beta", "blue"))
      .toDF("station_id", "station_name", "line")
    val in = MemoryStream[Int]
    val joined = in.toDF().toDF("station_id")
      .join(dim, Seq("station_id"), "left")

    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData(100, 101, 999)
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
      assert(out == Map(100 -> Some("Alpha"), 101 -> Some("Beta"), 999 -> None))
    } finally q.stop()
  }

  test("chained stateful operators: watermarked join feeds a windowed agg") {
    // Spark 4 runs MULTIPLE stateful operators in one streaming query
    // when every input is watermarked — here a time-range stream-stream
    // join whose output flows into a tumbling-window aggregate, the
    // enrich-then-rollup shape a 100 TB pipeline wants as ONE query
    // (two state stores, one checkpoint, no intermediate topic). The
    // emitted bars must equal the batch twin over the same rows.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val leftIn = MemoryStream[(java.sql.Timestamp, String, Double)]
    val rightIn = MemoryStream[(java.sql.Timestamp, String, String)]
    def pipeline(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) = l
      .join(r, expr("""k = k2 AND
        rts BETWEEN lts - INTERVAL 10 MINUTES AND lts + INTERVAL 10 MINUTES"""))
      .groupBy(window(col("lts"), "30 minutes"), col("tag"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("window.start").as("ws"), col("tag"), col("n"), col("sv"))

    val q = pipeline(
      leftIn.toDF().toDF("lts", "k", "v").withWatermark("lts", "10 minutes"),
      rightIn.toDF().toDF("rts", "k2", "tag").withWatermark("rts", "10 minutes"))
      .writeStream.format("memory").queryName("chain_out")
      .outputMode("append").start()
    try {
      val lRows = Seq((ts(1), "a", 2.0), (ts(5), "a", 3.0), (ts(7), "b", 10.0))
      val rRows = Seq((ts(2), "a", "hot"), (ts(6), "b", "cold"))
      leftIn.addData(lRows: _*)
      rightIn.addData(rRows: _*)
      q.processAllAvailable()
      // push the watermark far past the window end twice: the join
      // emits on the first advance, the downstream window finalizes
      // the batch after
      for (m <- Seq(240, 480)) {
        leftIn.addData((ts(m), "zz", 0.0))
        rightIn.addData((ts(m), "zz2", "none"))
        q.processAllAvailable()
      }
      assert(q.recentProgress.exists(_.stateOperators.length >= 2),
        "expected two stateful operators (join + window agg) in one query")
      val got = spark.table("chain_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val expected = pipelineBatchTwin(lRows, rRows)
      assert(got == expected, s"streamed $got vs batch $expected")
    } finally q.stop()
  }

  private def pipelineBatchTwin(
      lRows: Seq[(java.sql.Timestamp, String, Double)],
      rRows: Seq[(java.sql.Timestamp, String, String)]) = {
    import spark.implicits._
    lRows.toDF("lts", "k", "v")
      .join(rRows.toDF("rts", "k2", "tag"), expr("""k = k2 AND
        rts BETWEEN lts - INTERVAL 10 MINUTES AND lts + INTERVAL 10 MINUTES"""))
      .groupBy(window(col("lts"), "30 minutes"), col("tag"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("window.start").as("ws"), col("tag"), col("n"), col("sv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("foreachBatch sink receives each micro-batch exactly once (K5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Int]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cp = java.nio.file.Files.createTempDirectory("fb_cp").toString
    val q = KafkaSinks.foreachBatch(
      in.toDF(), cp, org.apache.spark.sql.streaming.OutputMode.Append()) {
      (df, batchId) => seen.add((batchId, df.count()))
    }.start()
    try {
      in.addData(1, 2, 3)
      q.processAllAvailable()
      in.addData(4)
      q.processAllAvailable()
      val batches = seen.toArray(Array.empty[(Long, Long)]).toList.sortBy(_._1)
      assert(batches.map(_._2) == List(3L, 1L))
      assert(batches.map(_._1) == batches.map(_._1).distinct)
    } finally q.stop()
  }
}
