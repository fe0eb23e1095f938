package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the "no other row is at least as
  * good in both dimensions and strictly better in one" query behind
  * best-tradeoff views (price vs quality, cost vs throughput). The
  * naive form is a quadratic NOT EXISTS self-join; maximizing two
  * integer dimensions decomposes into linear window algebra:
  *
  *   a row survives  iff  y = max_y(its x-group)
  *                   and  y > max over STRICTLY greater x of max_y.
  *
  * (Same-x rows below their group max are dominated within the group;
  * group maxima are dominated iff some higher-x group reaches >= their
  * y. Ties on both dims all survive — neither dominates.)
  *
  * Scale shape: one grouped agg to per-x maxima (x-cardinality rows),
  * ONE window over that tiny frame ordered by x desc for the running
  * best-from-higher-x, then a broadcast join back tags survivors.
  * Nothing quadratic, nothing data-sized in the window.
  */
object Skyline {

  /** Rows of `df` on the maximize-(xCol, yCol) Pareto frontier.
    * Both columns must be integer-valued; all input columns pass
    * through unchanged. */
  def pareto2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val groupMax = df.groupBy(col(xCol).as("_x"))
      .agg(max(col(yCol)).as("_maxy"))
    val h = Window.orderBy(col("_x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = groupMax
      .withColumn("_besthigher", max(col("_maxy")).over(h))
      .filter(col("_besthigher").isNull || col("_maxy") > col("_besthigher"))
      .select(col("_x"), col("_maxy"))
    df.join(broadcast(frontier),
        col(xCol) === col("_x") && col(yCol) === col("_maxy"))
      .drop("_x", "_maxy")
  }
}
