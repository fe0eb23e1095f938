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
  * own store — which the rebuild-from-scratch queries rely on.
  *
  * Accumulation is bounded two ways (pid namespacing alone would leak
  * one store-set per run): a shutdown hook deletes this JVM's dir on
  * clean exit, and first use sweeps sibling `graft-<pid>` dirs whose
  * owning process is gone — so a SIGKILLed run's debris lives only
  * until the next run, never forever. */
object QueryScratch {
  private val nonce: String = java.lang.ProcessHandle.current().pid().toString

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }

  private lazy val root: java.io.File = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    // stale sweep: dirs of dead pids (crashed/killed earlier runs)
    val stale = tmp.listFiles()
    if (stale != null) stale.foreach { f =>
      if (f.isDirectory && f.getName.startsWith("graft-")) {
        f.getName.stripPrefix("graft-").toLongOption.foreach { pid =>
          val alive = java.lang.ProcessHandle.of(pid)
            .map[java.lang.Boolean](_.isAlive).orElse(java.lang.Boolean.FALSE)
          if (!alive) deleteRecursively(f)
        }
      }
    }
    val own = new java.io.File(tmp, s"graft-$nonce")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(own)))
    own
  }

  def dir(name: String): String = new java.io.File(root, name).getPath
}
