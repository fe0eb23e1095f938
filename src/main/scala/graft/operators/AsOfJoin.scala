package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (backward) join: for every left row, the latest right row whose
  * timestamp is <= the left timestamp, within the same key — the
  * versioned-dimension / point-in-time lookup missing from Spark's
  * built-in join types.
  *
  * Tier-(a) composition (see `graft.plans`): tagged union of both sides,
  * one hash-shuffle on the key, and a per-key window that carries the
  * most recent right-side value forward (`last(_, ignoreNulls)` over an
  * unbounded-preceding rows frame). Right rows sort BEFORE left rows at
  * equal timestamps, so the match is inclusive (ts_right == ts_left
  * matches), mirroring `ASOF JOIN ... ON l.ts >= r.ts` semantics.
  *
  * Compared with the naive range join (`l.k = r.k AND r.ts <= l.ts` +
  * max-per-left aggregation) this touches each row once and never
  * builds the quadratic intermediate — at 100 TB the union/window plan
  * is one shuffle + one sort, same cost class as a groupBy.
  *
  * The right side must be unique per (key, ts) — pre-aggregate ties
  * (e.g. `groupBy(key, ts).agg(max(...))`) for deterministic results.
  */
object AsOfJoin {

  def asOfBackward(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightVal: String, outCol: String): DataFrame = {
    val valType = right.schema(rightVal).dataType
    val leftCols = left.columns
    // The carried value is struct-wrapped: right rows contribute a
    // non-null struct even when the VALUE inside is null, so
    // last(ignoreNulls) tracks "latest right ROW", not "latest
    // non-null value" — a matched version with a null value correctly
    // yields null instead of leaking the previous version's value.
    val l = left.select(
      col(leftKey).as("_k"),
      col(leftTs).cast("timestamp").as("_ts"),
      lit(1).as("_tag"),
      lit(null).cast(StructType(Seq(StructField("v", valType)))).as("_vv"),
      struct(leftCols.map(col): _*).as("_row"))
    val r = right.select(
      col(rightKey).as("_k"),
      col(rightTs).cast("timestamp").as("_ts"),
      lit(0).as("_tag"),
      struct(col(rightVal).cast(valType).as("v")).as("_vv"),
      lit(null).cast(l.schema("_row").dataType).as("_row"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val projected: Seq[Column] =
      leftCols.map(c => col(s"_row.$c").as(c)) :+ col("_asof.v").as(outCol)
    l.unionByName(r)
      .withColumn("_asof", last(col("_vv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(projected: _*)
  }
}
