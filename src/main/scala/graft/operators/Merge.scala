package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) — the snapshot-maintenance operator of a CDC
  * ingest: fold a keyed batch of updates into a keyed target snapshot
  * with UPDATE / INSERT / DELETE semantics, producing the next
  * snapshot. Complements q141's SCD2 (which keeps history as validity
  * intervals; merge keeps only the current image).
  *
  * Scale design (100 TB): ONE full-outer shuffle join on the merge key
  * — both sides hash-partition by key and stream; no row ever
  * compares against more than its key partner, and AQE's skew split
  * covers hot keys. The update/insert/delete arbitration is pure
  * column logic (codegen'd CASE), never a driver loop. At petabyte
  * scale the target side would be a bucketed table so the join
  * reshuffles only the (much smaller) update batch — the operator is
  * agnostic to that layout choice.
  */
object Merge {

  /** Merge `source` into `target` (same schema, unique `key` per side).
    *
    *  - key in both:        source row wins (UPDATE) — unless
    *                        `deleteCond` holds on the source row, in
    *                        which case the key is dropped (DELETE);
    *  - key only in source: source row is added (INSERT) — unless
    *                        `deleteCond` holds (a delete for an absent
    *                        key is a no-op, the standard MERGE rule);
    *  - key only in target: target row is kept (KEEP).
    *
    * `deleteCond` is a predicate over the SOURCE row's columns, which
    * are exposed with an `s_` prefix (e.g. `col("s_event_type") ===
    * "error"`). Returns the merged snapshot plus an `op` column
    * ('keep' | 'update' | 'insert') for audit/metrics.
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String,
      deleteCond: Column): DataFrame = {
    val cols = target.columns.toSeq
    require(source.columns.toSeq == cols,
      s"mergeUpsert requires identical schemas; target=$cols " +
        s"source=${source.columns.toSeq}")
    val payload = cols.filterNot(_ == key)
    val s = source.select(
      (col(key).as("s_key") +: payload.map(c => col(c).as(s"s_$c"))): _*)
    val joined = target.join(s, col(key) === col("s_key"), "full_outer")
    val op = when(col("s_key").isNull, lit("keep"))
      .when(col(key).isNull, lit("insert"))
      .otherwise(lit("update"))
    val merged = joined
      .withColumn("op", op)
      .filter(!coalesce(deleteCond, lit(false)))
    val out = coalesce(col("s_key"), col(key)).as(key) +:
      payload.map(c => coalesce(col(s"s_$c"), col(c)).as(c)) :+ col("op")
    merged.select(out: _*)
  }
}
