package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's verification query;
  * `oracleSql` carries the exact DuckDB twin for each (same column names,
  * same deterministic ORDER BY, decimal-exact aggregates on both sides).
  */
object SparkEntry {

  val registry: Seq[GraftQuery] =
    CoreQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ ExtendedQueries.all ++ PipelineQueries.all ++
      CorpusQueries.all ++ MaintenanceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full STEDI decode chain (JSON-in-base64-in-JSON -> unbase64 ->
    * null-filter -> birthYear split -> equi-join) over synthesized
    * payloads — the reference's flagship dataflow end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q32_stedi_end_to_end")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  private def normalize(sql: String): String =
    sql.stripMargin.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
