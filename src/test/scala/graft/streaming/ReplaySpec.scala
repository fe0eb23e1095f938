package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.TextFunctions

class ReplaySpec extends SparkSpec {

  test("events parquet replayed as a stream aggregates like batch (S8)") {
    val batch = Tables.table(spark, sf001, "events")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // file stream source needs a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Replay.eventsStream(spark, dir.toString)
    assert(stream.isStreaming)
    val agg = stream.groupBy(col("event_type")).count()
    val q = agg.writeStream.format("memory").queryName("replay_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replay_counts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("checkpointed file-sink query restarts without reprocessing (§2.8 recovery)") {
    val in = java.nio.file.Files.createTempDirectory("ck_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      in.resolve("events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("ck_out").toString
    val cp = java.nio.file.Files.createTempDirectory("ck_cp").toString
    val expected = Tables.table(spark, sf001, "events").count()

    def run(): Unit = {
      val q = Replay.eventsStream(spark, in.toString)
        .select(col("event_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // first run processes the file
    run() // restart from checkpoint: no new input -> no reprocessing
    assert(spark.read.parquet(out).count() == expected)
  }

  test("routedWrite partitions output by route value (F4 topic router)") {
    val tmp = java.nio.file.Files.createTempDirectory("routed").toString
    val df = Tables.table(spark, sf001, "events")
      .withColumn("route",
        when(col("event_type") === "error", "alerts").otherwise("rest"))
    Replay.routedWrite(df, "route", tmp)
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("route=alerts", "route=rest"))
    val back = spark.read.parquet(tmp)
    assert(back.count() == df.count())
  }

  test("topicName normalization chain matches reference semantics (P13)") {
    import spark.implicits._
    val out = Seq("Addison/Kimball Stop-1 O'Hare").toDF("s")
      .select(TextFunctions.topicName(col("s"))).collect()(0).getString(0)
    assert(out == "addison_and_kimball_stop_1_ohare")
  }

  test("startHealed: empty-dir bootstrap then legacy nanos files heals with ONE restart") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64

    val nanosConf = "spark.sql.legacy.parquet.nanosAsLong"
    val prevNanos = spark.conf.getOption(nanosConf)
    spark.conf.unset(nanosConf) // canonical bootstrap: NTZ default pinned
    val root = java.nio.file.Files.createTempDirectory("graft-heal").toString
    val in = s"$root/in"
    val out = s"$root/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    def writeLegacyFile(): Unit = {
      val schema = Types.buildMessage()
        .required(INT64).named("event_id")
        .required(INT64)
        .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
        .named("events")
      val conf = new org.apache.hadoop.conf.Configuration()
      GroupWriteSupport.setSchema(schema, conf)
      val writer = ExampleParquetWriter.builder(
          new org.apache.hadoop.fs.Path(s"$in/events.parquet"))
        .withConf(conf).withType(schema).build()
      writer.write(new SimpleGroupFactory(schema).newGroup()
        .append("event_id", 7L).append("ts", 1700000000123456789L))
      writer.close()
    }

    var starts = 0
    try {
      val q = Replay.startHealed(spark, in) { df =>
        starts += 1
        val started = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", s"$root/cp")
          .start()
        // the bootstrap corner, sequenced exactly: the stream's schema
        // was pinned against an EMPTY directory (the probe ran before
        // this hook), and the first file to land is a LEGACY
        // INT64-nanos one — the first micro-batch must die on it
        if (starts == 1) writeLegacyFile()
        started
      }()
      try {
        assert(starts == 2, s"expected exactly one healing restart, got $starts")
        val rows = spark.read.parquet(out).collect()
        assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
          Seq((7L, 1700000000123456L))) // sub-micro tail truncated
      } finally q.stop()
    } finally prevNanos match {
      case Some(v) => spark.conf.set(nanosConf, v)
      case None => spark.conf.unset(nanosConf)
    }
  }

  test("startHealed: a healthy current-generation bootstrap never restarts") {
    val root = java.nio.file.Files.createTempDirectory("graft-heal-ok").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      java.nio.file.Paths.get(s"$in/events.parquet"))
    var starts = 0
    val q = Replay.startHealed(spark, in) { df =>
      starts += 1
      df.groupBy(col("event_type")).count()
        .writeStream.format("memory").queryName("heal_noop")
        .outputMode("complete").start()
    }()
    try {
      assert(starts == 1, s"healthy stream must not restart, got $starts")
      assert(spark.table("heal_noop").count() > 0)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog then stops on its own " +
      "(the backfill mode: streaming exactly-once semantics, batch lifetime)") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-anow").toString
    val in = s"$root/in"
    val out = s"$root/out"
    // a pre-existing backlog of two files
    Seq(1L, 2L).toDF("v").coalesce(1).write.mode("append").parquet(in)
    Seq(3L).toDF("v").coalesce(1).write.mode("append").parquet(in)
    def run(): Unit = {
      val q = spark.readStream
        .schema("v LONG").parquet(in)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      // awaitTermination returns because AvailableNow SELF-terminates
      // after the backlog — a processing-time trigger would hang here
      assert(q.awaitTermination(60000),
        "AvailableNow query did not self-terminate")
    }
    run()
    val got = spark.read.parquet(out).as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
    // a restart from the same checkpoint reprocesses NOTHING already
    // committed: only the file that arrived between runs lands
    Seq(4L).toDF("v").coalesce(1).write.mode("append").parquet(in)
    run()
    val got2 = spark.read.parquet(out).as[Long].collect().sorted.toSeq
    assert(got2 == Seq(1L, 2L, 3L, 4L), s"restart broke exactly-once: $got2")
  }
}
