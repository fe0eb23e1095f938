package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source builders (SURVEY.md §2.1 S6 — the reference's Kafka
  * Connect JDBC connector: `table.whitelist=stations`,
  * `mode=incrementing` on stop_id, producers/connector.py:23-45).
  *
  * The incremental pattern is re-expressed as a re-read with a
  * `WHERE incCol > lastSeen` pushdown subquery — each poll reads only
  * new rows, exactly like the connector's incrementing mode. Coverage
  * runs end-to-end against the EMBEDDED Derby that ships with Spark's
  * jars (`jdbc:derby:memory:` — JdbcSourceSpec loads the reference's
  * stations fixture and asserts all three read shapes including the
  * pushed-down incrementing subquery; q121 oracle-gates a full
  * write/poll round-trip on `documents`). At 100 TB the partitioned
  * read spreads the scan over `numPartitions` executor-side range
  * queries.
  */
object JdbcSource {

  /** Embedded Derby URL for a per-JVM in-memory database — the test
    * backend (Derby's jars ride in /opt/spark/jars). First use pins
    * `derby.system.home` to the tmpdir so derby.log never lands in the
    * process working directory. */
  def derbyMemoryUrl(db: String): String = {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        System.getProperty("java.io.tmpdir"))
    s"jdbc:derby:memory:$db;create=true"
  }

  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Incremental poll: only rows with incCol > lastSeen, pushed into the
    * database as a subquery. `incCol` splices verbatim into that SQL —
    * pass it pre-quoted (e.g. `"\"doc_id\""`) when the column was
    * created with quoted case-sensitive identifiers, as Spark's own
    * JDBC sink does. */
  def readIncremental(
      spark: SparkSession, url: String, table: String,
      incCol: String, lastSeen: Long,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(
      url, s"(SELECT * FROM $table WHERE $incCol > $lastSeen) AS graft_inc", props)

  /** Range-partitioned parallel read for large tables: `numPartitions`
    * concurrent range scans on an indexed numeric column. */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(
      url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)
}
