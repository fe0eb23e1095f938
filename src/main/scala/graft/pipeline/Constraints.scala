package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ/Great-Expectations
  * shape, engine-native): a rule set over a table evaluates to one
  * (rule, violations) report row per rule.
  *
  * The 100 TB contract is pass-count, not rule-count: every ROW-LEVEL
  * rule (null, range, set, pattern, cross-column) folds into a single
  * conditional-count aggregate — N rules still scan the table ONCE,
  * entirely inside whole-stage codegen. Only two rule kinds pay more,
  * because their semantics are not row-local: uniqueness is one
  * two-level aggregate (per-key counts, map-side combined), and
  * referential integrity is one anti-join against the dimension
  * (broadcast when small). Nothing ever collects unbounded data — the
  * report is |rules| rows.
  */
object Constraints {

  sealed trait Rule { def name: String }

  /** Row-level: `violated` is any boolean Column over the row. */
  final case class RowRule(name: String, violated: Column) extends Rule

  // Rule names carry their PARAMETERS: two different rules on the same
  // column (two regexes, two value sets) must not collide into one
  // report row — a name collision would silently report one rule's
  // count for both, and check() also rejects duplicates loudly.
  def notNull(c: String): Rule =
    RowRule(s"not_null:$c", col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    RowRule(s"in_range:$c[$lo,$hi]",
      col(c).isNull || col(c) < lo || col(c) > hi)
  def oneOf(c: String, values: Seq[String]): Rule =
    RowRule(s"one_of:$c[${values.mkString(",")}]",
      col(c).isNull || !col(c).isin(values: _*))
  def matches(c: String, regex: String): Rule =
    RowRule(s"matches:$c[$regex]", col(c).isNull || !col(c).rlike(regex))

  /** Key-level: rows beyond the first per duplicate key violate. */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique:${cols.mkString(",")}"
  }

  /** Referential: rows whose `c` has no match in `dim.dimCol` violate. */
  final case class RefIn(c: String, dim: DataFrame, dimCol: String)
    extends Rule {
    val name = s"ref_in:$c->$dimCol"
  }

  /** ZERO-extra-pass evaluation of the row-level rules: the
    * conditional counts ride the caller's OWN job via `df.observe`, so
    * a 100 TB write gets its quality report for free — no second scan
    * at all (where [[check]] runs one). Returns the instrumented frame
    * to execute and a handle whose `get` blocks until the first action
    * on that frame completes, then yields rule -> violations. Only
    * RowRules can ride along (uniqueness/referential need their own
    * shapes — use [[check]] for those). */
  def observed(df: DataFrame, rules: Seq[RowRule])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "observed() needs at least one row rule")
    val dup = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate rule names would collide in the report: $dup")
    val obs = org.apache.spark.sql.Observation()
    val aggs = rules.map(r => count(when(r.violated, lit(1))).as(r.name))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Evaluate all rules; returns (rule, violations), one row per rule,
    * in the given rule order made deterministic by a trailing sort on
    * rule name by callers that hash the output. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dup = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate rule names would collide in the report: $dup")
    val rowRules = rules.collect { case r: RowRule => r }
    val rowCounts: Map[String, Long] =
      if (rowRules.isEmpty) Map.empty
      else {
        // count(when(...)) never returns null — an EMPTY table reports
        // 0 violations per rule instead of NPE-ing on a null sum
        val aggs = rowRules.map(r =>
          count(when(r.violated, lit(1))).as(r.name))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        rowRules.zipWithIndex
          .map { case (r, i) => r.name -> row.getLong(i) }.toMap
      }
    val otherCounts: Seq[(String, Long)] = rules.collect {
      case u: Unique =>
        // violations = rows that are not the single keeper of their key
        val over = df.groupBy(u.cols.map(col): _*)
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(sum(col("c") - 1)).collect()(0)
        u.name -> (if (over.isNullAt(0)) 0L else over.getLong(0))
      case r: RefIn =>
        r.name -> df.join(
          broadcast(r.dim.select(col(r.dimCol).as(r.c)).distinct()),
          Seq(r.c), "left_anti").count()
    }
    val all = rules.map {
      case r: RowRule => r.name -> rowCounts(r.name)
      case other => otherCounts.find(_._1 == other.name).get
    }
    all.toDF("rule", "violations")
  }
}
