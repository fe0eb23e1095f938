package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JdbcSource against a REAL database — embedded Derby (in
  * /opt/spark/jars), hosting the reference's `stations` table
  * (kafka-streaming-pipeline/load_stations.sql:1-12) in-memory. The
  * three read shapes run end-to-end, including the Kafka Connect
  * incrementing-mode semantics (producers/connector.py:23-45:
  * `mode=incrementing`, `incrementing.column.name=stop_id` — each poll
  * sees only rows beyond the last seen id) and the pushdown evidence
  * in the plan: the incremental poll's WHERE executes IN the database,
  * not in Spark.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = JdbcSource.derbyMemoryUrl("graft_spec")

  // Derby uppercases unquoted identifiers; "order" needs quoting (the
  // reference DDL quotes it for Postgres too)
  private lazy val fixture: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE stations (
        stop_id INTEGER PRIMARY KEY,
        direction_id VARCHAR(1) NOT NULL,
        stop_name VARCHAR(70) NOT NULL,
        station_name VARCHAR(70) NOT NULL,
        station_descriptive_name VARCHAR(200) NOT NULL,
        station_id INTEGER NOT NULL,
        "order" INTEGER,
        red BOOLEAN NOT NULL,
        blue BOOLEAN NOT NULL,
        green BOOLEAN NOT NULL)""")
      val ins = conn.prepareStatement(
        "INSERT INTO stations VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)")
      (1 to 8).foreach { i =>
        ins.setInt(1, i * 10)
        ins.setString(2, if (i % 2 == 0) "N" else "S")
        ins.setString(3, s"stop-$i")
        ins.setString(4, s"station-$i")
        ins.setString(5, s"Station $i (Red Line)")
        ins.setInt(6, 100 + i)
        ins.setInt(7, i)
        ins.setBoolean(8, i % 2 == 0)
        ins.setBoolean(9, i % 3 == 0)
        ins.setBoolean(10, i % 5 == 0)
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
  }

  test("read: full-table snapshot matches the loaded fixture") {
    fixture
    val df = JdbcSource.read(spark, url, "stations")
    assert(df.count() == 8)
    // Derby reports uppercase metadata names
    assert(df.columns.toSeq.contains("STOP_ID"))
    val row = df.filter(col("STOP_ID") === 40)
      .select("DIRECTION_ID", "STATION_ID", "RED").collect()(0)
    assert(row.getString(0) == "N" && row.getInt(1) == 104 && row.getBoolean(2))
  }

  test("readIncremental: connector incrementing-mode polls, pushed down") {
    fixture
    // first poll from 0 sees everything; a poll from the max sees nothing
    assert(JdbcSource.readIncremental(spark, url, "stations", "stop_id", 0L)
      .count() == 8)
    assert(JdbcSource.readIncremental(spark, url, "stations", "stop_id", 80L)
      .count() == 0)
    // mid-stream poll: strictly-greater semantics (lastSeen itself excluded)
    val poll = JdbcSource.readIncremental(spark, url, "stations", "stop_id", 50L)
    assert(poll.select("STOP_ID").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(60, 70, 80))
    // pushdown evidence: the WHERE rides the JDBC relation itself (the
    // scan's table IS the subquery) — no Spark-side Filter needed
    val plan = poll.queryExecution.executedPlan
    assert(plan.toString.contains("graft_inc"),
      s"incremental subquery not in the scan relation:\n$plan")
    assert(plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty,
      s"incremental poll planned a Spark-side Filter — predicate was " +
        s"not pushed into the database:\n$plan")
  }

  test("read filters push to the database as PushedFilters") {
    fixture
    val df = JdbcSource.read(spark, url, "stations")
      .filter(col("STOP_ID") > 50).select("STOP_ID", "STOP_NAME")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan"),
      s"expected GreaterThan in PushedFilters:\n$scan")
    assert(df.count() == 3)
  }

  test("pollIncrementalOnce: sink-derived offsets; idle polls land nothing; lifecycle stamps") {
    import org.apache.spark.sql.types._
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE poll_src (id BIGINT, v VARCHAR(10))")
      (1 to 5).foreach(i => st.execute(s"INSERT INTO poll_src VALUES ($i, 'a$i')"))
      st.close()
    } finally conn.close()
    val store = java.nio.file.Files.createTempDirectory("jdbc_poll").toString + "/store"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))

    // first poll from an empty store lands everything as batch 0
    assert(JdbcSource.pollIncrementalOnce(
      spark, url, "poll_src", "id", "id", store, schema) == 5L)
    // nothing new: no rows, no batch dir, fence unchanged
    assert(JdbcSource.pollIncrementalOnce(
      spark, url, "poll_src", "id", "id", store, schema) == 0L)
    val afterIdle = graft.streaming.BatchIndex.read(spark, store, schema)
    assert(afterIdle.count() == 5)
    assert(afterIdle.select("batch").distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L))

    // new rows land as the NEXT batch, older ones never re-poll
    val c2 = DriverManager.getConnection(url)
    try {
      val st = c2.createStatement()
      (6 to 8).foreach(i => st.execute(s"INSERT INTO poll_src VALUES ($i, 'a$i')"))
      st.close()
    } finally c2.close()
    assert(JdbcSource.pollIncrementalOnce(
      spark, url, "poll_src", "id", "id", store, schema) == 3L)
    val rows = graft.streaming.BatchIndex.read(spark, store, schema)
      .select("id", "batch").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == ((1 to 5).map(_.toLong -> 0L) ++ (6 to 8).map(_.toLong -> 1L)).toMap)
    // the store carries admission stamps — retention/compaction ready
    val stamps = new java.io.File(store, "_batch_ts").list()
    assert(stamps != null &&
      stamps.filterNot(_.startsWith(".")).toSet == Set("0", "1"))
  }

  test("pollStream: a ticker stream drives the same durable poll loop") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE tick_src (id BIGINT, v VARCHAR(10))")
      (1 to 4).foreach(i => st.execute(s"INSERT INTO tick_src VALUES ($i, 'b$i')"))
      st.close()
    } finally conn.close()
    val dir = java.nio.file.Files.createTempDirectory("jdbc_poll_stream").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val ticker = MemoryStream[Long]
    val q = JdbcSource.pollStream(
      ticker.toDF(), url, "tick_src", "id", "id", s"$dir/store", schema,
      s"$dir/ckpt").start()
    try {
      ticker.addData(1L); q.processAllAvailable()
      val c2 = DriverManager.getConnection(url)
      try {
        val st = c2.createStatement()
        st.execute("INSERT INTO tick_src VALUES (9, 'b9')")
        st.close()
      } finally c2.close()
      ticker.addData(2L); q.processAllAvailable()
    } finally q.stop()
    val rows = graft.streaming.BatchIndex.read(spark, s"$dir/store", schema)
      .select("id", "batch").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 9L -> 1L))
  }

  test("readPartitioned: range-split parallel read covers all rows exactly once") {
    fixture
    val df = JdbcSource.readPartitioned(
      spark, url, "stations", "stop_id", lowerBound = 10L, upperBound = 81L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    // stride predicates must partition the id space: no dup, no drop
    assert(df.select("STOP_ID").collect().map(_.getInt(0)).sorted
      .toSeq == (1 to 8).map(_ * 10))
  }
}
