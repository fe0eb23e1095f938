package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source builders (SURVEY.md §2.1 S6 — the reference's Kafka
  * Connect JDBC connector: `table.whitelist=stations`,
  * `mode=incrementing` on stop_id, producers/connector.py:23-45).
  *
  * The incremental pattern is re-expressed as a re-read with a
  * `WHERE incCol > lastSeen` pushdown subquery — each poll reads only
  * new rows, exactly like the connector's incrementing mode. No RDBMS
  * ships in the test environment, so coverage is the CSV-snapshot path
  * (Cta.readStationsCsv) + these builders compiling against the public
  * JDBC options; at 100 TB the partitioned read spreads the scan over
  * `numPartitions` executor-side range queries.
  */
object JdbcSource {

  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Incremental poll: only rows with incCol > lastSeen, pushed into the
    * database as a subquery. */
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
