package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a DataFrame program plus (where SQL can
  * express it) an exact ANSI-SQL twin the driver runs in DuckDB.
  *
  * Contract notes (driver compare):
  *  - column names must match between the Spark result and the oracle —
  *    every computed column is aliased identically on both sides;
  *  - results are made row-deterministic with a trailing ORDER BY on a
  *    unique key, so hashing is stable regardless of partitioning;
  *  - double aggregates are computed in exact decimal and cast to double
  *    at the end on BOTH sides, so there is no float-summation-order
  *    divergence between Spark and DuckDB.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Per-process scratch namespace for the queries that build durable
  * stores (the served-index and maintenance families). The JVM pid
  * segments the path: two concurrent bench/test JVMs on one host would
  * otherwise race on deleteDir/overwrite of the SAME fixed tmp dirs and
  * corrupt each other's results mid-pass. Stable within a run (the pid
  * is constant), so re-executions inside one JVM still overwrite their
  * own store — which the rebuild-from-scratch queries rely on. */
object QueryScratch {
  private val nonce: String = java.lang.ProcessHandle.current().pid().toString
  def dir(name: String): String =
    new java.io.File(new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft-$nonce"), name).getPath
}
