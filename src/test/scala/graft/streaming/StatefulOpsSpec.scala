package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming table semantics (SURVEY.md §2.5 A1/A2, §2.8): update-mode
  * counts and last-write-wins keyed state over MemoryStream. */
class StatefulOpsSpec extends SparkSpec {

  test("countByKey in update mode emits changelog rows per batch (A1/KSQL)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val counts = StatefulOps.countByKey(in.toDF().toDF("station_id", "line"),
      "station_id", "STATION_ID", "COUNT")

    val q = counts.writeStream.format("memory").queryName("ts_counts")
      .outputMode("complete").start()
    try {
      in.addData((100, "red"), (100, "red"), (101, "blue"))
      q.processAllAvailable()
      val m1 = spark.table("ts_counts").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(m1 == Map(100 -> 2L, 101 -> 1L))

      in.addData((100, "red"))
      q.processAllAvailable()
      val m2 = spark.table("ts_counts").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(m2 == Map(100 -> 3L, 101 -> 1L))
    } finally q.stop()
  }

  test("upsertLatest keeps max-ordinal write per key across batches (A2/Faust table)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Long, String)]
    val latest = StatefulOps.upsertLatest(in.toDS())

    val q = latest.writeStream.format("memory").queryName("latest_tbl")
      .outputMode("update").start()
    try {
      // both writes for key 1 land in ONE batch, newer ordinal first —
      // iterator order must not matter
      in.addData((1, 20L, "v2"), (1, 10L, "v1"), (2, 5L, "a"))
      q.processAllAvailable()
      val rows1 = spark.table("latest_tbl").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(rows1 == Set((1, "v2"), (2, "a")))

      in.addData((1, 30L, "v3"))
      q.processAllAvailable()
      val rows2 = spark.table("latest_tbl").collect()
        .map(r => (r.getInt(0), r.getString(1)))
      assert(rows2.contains((1, "v3")))
    } finally q.stop()
  }

  test("trendingTerms: closed windows emit final counts; topKPerWindow ranks them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val out = StatefulOps.trendingTerms(
      in.toDF().toDF("ts", "text"), "ts", "text",
      windowDur = "10 minutes", watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    try {
      in.addData((ts(1), "aa aa bb"), (ts(2), "aa cc"))
      q.processAllAvailable()
      // first window still open: append emits nothing yet
      assert(spark.table("trending").count() == 0)

      // an event far past the window end advances the watermark
      in.addData((ts(25), "zz"))
      q.processAllAvailable()
      in.addData((ts(26), "zz"))
      q.processAllAvailable()

      val closed = spark.table("trending")
      val counts = closed.collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(counts == Map("aa" -> 3L, "bb" -> 1L, "cc" -> 1L))

      val top1 = StatefulOps.topKPerWindow(closed, k = 1)
        .select("term", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(top1.toSeq == Seq(("aa", 1L)))
    } finally q.stop()
  }

  test("upsertLatestTws (transformWithState/RocksDB) matches upsertLatest semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Int, Long, String)]
      // NOTE: tested with the default TTLConfig.NONE. A non-NONE TTL
      // switches the operator to TimeMode.ProcessingTime (required for
      // TTL state), whose continuous trigger does not terminate under
      // processAllAvailable in this MemoryStream harness.
      val latest = StatefulOps.upsertLatestTws(in.toDS())
      val q = latest.writeStream.format("memory").queryName("latest_tws")
        .outputMode("update").start()
      try {
        in.addData((1, 20L, "v2"), (1, 10L, "v1"), (2, 5L, "a"))
        q.processAllAvailable()
        val rows1 = spark.table("latest_tws").collect()
          .map(r => (r.getInt(0), r.getString(1))).toSet
        assert(rows1 == Set((1, "v2"), (2, "a")))

        in.addData((1, 30L, "v3"), (1, 1L, "stale"))
        q.processAllAvailable()
        val rows2 = spark.table("latest_tws").collect()
          .map(r => (r.getInt(0), r.getString(1)))
        assert(rows2.contains((1, "v3")))
        assert(!rows2.contains((1, "stale")))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("upsertLatestTws TTL branch: state expires after the TTL, survives within it") {
    // Exercises the TimeMode.ProcessingTime + non-NONE TTLConfig wiring
    // that processAllAvailable can't drive (ProcessingTime mode keeps
    // scheduling no-data batches to advance timers, so neither it nor
    // Trigger.AvailableNow ever terminates — observed: 500+ empty
    // batches). Trigger.Once runs EXACTLY one micro-batch per start,
    // and a checkpoint restart between starts lets wall-clock pass so
    // the TTL verdict is observable. Expired state means a LOWER
    // ordinal wins after the gap; live state means it still loses.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.{TTLConfig, Trigger}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCk = spark.conf.getOption("spark.sql.streaming.checkpoint.fileChecksum.enabled")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // two state partitions, checksum manager off: 32 concurrent RocksDB
    // snapshot uploads through ChecksumCheckpointFileManager deadlock in
    // this single-JVM test env (all closers parked on futures the idle
    // checksum pools never run); neither knob changes the semantics
    // under test (TTL expiry wiring)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try {
      def run(name: String, ttl: java.time.Duration, sleepMs: Long): Set[(Int, String)] = {
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"tws_ttl_$name").toString
        // memory sink rejects checkpoint recovery; foreachBatch supports it
        val results = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
        val in = MemoryStream[(Int, Long, String)]
        val latest = StatefulOps.upsertLatestTws(in.toDS(), TTLConfig(ttl))
        def runOnce(): Unit = {
          val q = latest.writeStream
            .foreachBatch((batch: org.apache.spark.sql.Dataset[(Int, String)], _: Long) =>
              batch.collect().foreach(results.add))
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(Trigger.Once()).start(): @annotation.nowarn("cat=deprecation")
          q.awaitTermination()
        }
        in.addData((1, 20L, "fresh"))
        runOnce()
        Thread.sleep(sleepMs)
        in.addData((1, 1L, "stale")) // lower ordinal: wins only if state expired
        runOnce()
        import scala.jdk.CollectionConverters._
        results.asScala.toSet
      }
      // TTL far beyond the test: state survives the restart, stale loses
      val live = run("tws_ttl_live", java.time.Duration.ofHours(1), sleepMs = 10)
      assert(live.contains((1, "fresh")) && !live.contains((1, "stale")))
      // TTL shorter than the gap: state expired, the stale ordinal wins
      val expired = run("tws_ttl_exp", java.time.Duration.ofMillis(500), sleepMs = 2000)
      assert(expired.contains((1, "stale")))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      prevCk match {
        case Some(p) => spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", p)
        case None => spark.conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")
      }
    }
  }

  test("watermarked tumbling-window counts: append mode emits closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val agg = StatefulOps.windowedCounts(
      in.toDF().toDF("ts", "k"), "ts", "k", "1 hour", "1 hour", "10 minutes")

    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      in.addData((ts(0), "a"), (ts(5), "a"), (ts(30), "b"))
      q.processAllAvailable()
      // advance the watermark past the first hour with a sentinel event
      in.addData((ts(24 * 60), "zz"))
      q.processAllAvailable()
      in.addData((ts(48 * 60), "zz"))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .filter(_.getString(1) != "zz")
        .map(r => (r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(("a", 2L), ("b", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: dups inside the delay drop, state evicts past it") {
    // the engine-native streaming dedup (Spark 3.5+): duplicates of a
    // key arriving within the watermark delay are dropped whatever
    // batch they ride in, and the key's state is EVICTED once the
    // watermark passes — bounded state, unlike a plain
    // dropDuplicates whose state grows forever. This is the built-in
    // sibling of IncrementalDedup's durable-store exactness; here the
    // contract under test is the bounded-state eviction itself.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = in.toDF().toDF("ts", "id")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("ddww")
      .outputMode("append").start()
    try {
      in.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
      q.processAllAvailable()
      in.addData((ts(3), 1L)) // still inside the delay: dropped
      q.processAllAvailable()
      // advance the watermark far past id 1's window, then REPLAY id 1:
      // its state must be gone, so the late duplicate emits again
      in.addData((ts(180), 99L))
      q.processAllAvailable()
      in.addData((ts(181), 1L))
      q.processAllAvailable()
      val got = spark.table("ddww").collect()
        .map(r => (r.getLong(1), r.getTimestamp(0))).toSeq
      val firstBatchIds = got.filter(_._2.getTime < ts(100).getTime).map(_._1)
      assert(firstBatchIds.sorted == Seq(1L, 2L),
        s"one row per id inside the window: $got")
      assert(got.count(_._1 == 1L) == 2,
        s"id 1 must re-emit after its state evicted: $got")
    } finally q.stop()
  }

  test("changedOnly suppresses unchanged upserts, re-emits on change (flatMapGroupsWithState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Long, String)]
    val changes = StatefulOps.changedOnly(in.toDS())

    val q = changes.writeStream.format("memory").queryName("cdc_out")
      .outputMode("append").start()
    try {
      in.addData((1, 1L, "A"), (1, 2L, "A"), (2, 3L, "X"))
      q.processAllAvailable()
      in.addData((1, 4L, "A")) // unchanged -> suppressed
      q.processAllAvailable()
      in.addData((1, 6L, "A"), (1, 5L, "B")) // B then back to A by ordinal
      q.processAllAvailable()
      val out = spark.table("cdc_out").collect()
        .map(r => (r.getInt(0), r.getString(1))).toList
      assert(out.count(_._1 == 1) == 3) // A, B, A
      assert(out.count(_._1 == 2) == 1)
      assert(out.filter(_._1 == 1).map(_._2) == List("A", "B", "A"))
    } finally q.stop()
  }

  test("latestPerKey declarative variant matches imperative on batch data") {
    import spark.implicits._
    val df = Seq((1, 10L, "old"), (1, 20L, "new"), (2, 5L, "x"))
      .toDF("k", "ord", "v")
    val out = StatefulOps.latestPerKey(df, "k", "ord").collect()
      .map(r => (r.getInt(0), r.getString(2))).toMap
    assert(out == Map(1 -> "new", 2 -> "x"))
  }

  test("intervalLeftJoin: matches emit eagerly; unmatched rows emit nulls " +
      "only after the watermark closes their join window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val vIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StatefulOps.intervalLeftJoin(
      vIn.toDF().toDF("view_id", "user_id", "ts"),
      pIn.toDF().toDF("purchase_id", "user_id", "ts"),
      "user_id", "ts", "2 hours", "1 hour")
    val q = joined.writeStream.format("memory").queryName("silj")
      .outputMode("append").start()
    def collected(): Set[(Long, Option[Long])] =
      spark.table("silj").select("l_view_id", "r_purchase_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    try {
      // v1 matches p100 inside its hour; v2 has no purchase — it must
      // NOT emit yet (a match could still arrive under the watermark)
      vIn.addData((1L, 1L, ts("2024-01-01 10:00:00")),
        (2L, 2L, ts("2024-01-01 10:00:00")))
      pIn.addData((100L, 1L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      assert(collected() == Set((1L, Some(100L))),
        s"null row leaked before the watermark: ${collected()}")
      // advance BOTH inputs (global watermark = min across streams)
      // past v2's window end 11:00 + 2h delay; the no-data batch after
      // the advance evicts v2's state and releases the null row
      vIn.addData((3L, 98L, ts("2024-01-01 14:00:00")))
      pIn.addData((101L, 99L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      vIn.addData((4L, 97L, ts("2024-01-01 14:30:00")))
      pIn.addData((102L, 99L, ts("2024-01-01 14:30:00")))
      q.processAllAvailable()
      assert(collected() == Set((1L, Some(100L)), (2L, None)),
        s"after watermark: ${collected()}")
    } finally q.stop()
  }
}
