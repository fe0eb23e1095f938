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
