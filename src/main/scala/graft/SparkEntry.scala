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

  /** Queries whose semantics are NOT SQL-expressible and therefore
    * carry no DuckDB oracle — each must be named here WITH the spec
    * that gates it instead. Every other registry entry must have an
    * oracle; the guard below fails loudly otherwise, so a query added
    * without its oracle (or an oracle dropped by a refactor) can never
    * silently shrink the driver's correctness coverage. */
  private val specOnlyAllowed: Map[String, String] = Map.empty

  val registry: Seq[GraftQuery] = {
    val all =
      CoreQueries.all ++ TextQueries.all ++ DedupQueries.all ++
        SimilarityQueries.all ++ ExtendedQueries.all ++ PipelineQueries.all ++
        CorpusQueries.all ++ MaintenanceQueries.all ++ FormatQueries.all ++
        GraphQueries.all
    val dup = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names in registry: $dup — the " +
      "name->query map would silently drop all but one")
    val unoracled = all.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(specOnlyAllowed.contains)
    require(unoracled.isEmpty, s"queries without a DuckDB oracle and not " +
      s"in specOnlyAllowed: $unoracled — add the oracle or document the " +
      "gating spec in specOnlyAllowed")
    val stale = specOnlyAllowed.keys.filterNot(n => all.exists(_.name == n))
    require(stale.isEmpty,
      s"specOnlyAllowed names queries not in the registry: $stale")
    all
  }

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
