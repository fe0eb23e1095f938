package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk layout versioning for every durable store and written
  * serving index. The stores already reject WRONG-PARAMETER opens
  * (vector width, quantization m/dim, meta-header mismatches), but a
  * store written by a DIFFERENT LAYOUT GENERATION — a pre-compaction
  * journal format, a renamed column, a re-ordered artifact — was only
  * caught incidentally, usually as a downstream cast error far from
  * the cause. Every store's meta now carries a `layout_version` field
  * stamped at write time and checked at open:
  *
  *  - meta WITHOUT the field: a store written before versioning —
  *    layout 1 by definition (this build's layout), read normally;
  *  - field == [[Version]]: read normally;
  *  - anything else: refuse LOUDLY at open with an upgrade note,
  *    instead of serving rows under layout assumptions that no longer
  *    hold.
  *
  * When a layout change ships, [[Version]] bumps and the open-time
  * check is where a migration shim would hook.
  */
private[graft] object StoreLayout {

  /** The store layout generation this build writes and reads. */
  val Version = 1L

  /** Stamp a store's meta frame with the current layout version
    * (appended LAST, so positional readers of older fields stay
    * valid). */
  def stamp(meta: DataFrame): DataFrame =
    meta.withColumn("layout_version", lit(Version))

  /** Validate an already-loaded meta frame against [[Version]].
    * A NULL version (partially-written or hand-doctored meta) is a
    * foreign/corrupt layout and refuses with the same loud upgrade
    * note — never a bare NPE far from the cause. */
  def check(meta: DataFrame, store: String): Unit =
    if (meta.columns.contains("layout_version")) {
      val row = meta.select(col("layout_version").cast("long")).collect()(0)
      if (row.isNullAt(0)) throw new IllegalStateException(
        s"$store carries a NULL store-layout version (partially written " +
          s"or corrupt meta); this build reads version $Version — " +
          "re-seed/rebuild the store from its source data")
      val v = row.getLong(0)
      if (v != Version) throw new IllegalStateException(
        s"$store was written by store-layout version $v; this build " +
          s"reads version $Version — re-seed/rebuild the store from its " +
          "source data, or open it with a build of the matching layout")
    } // no field: pre-versioning store, layout 1 by definition

  /** Read a store's meta, check the layout, return the (single) meta
    * row — the one-call shape for readers that already collect it. */
  def checkedMetaRow(
      spark: SparkSession, metaPath: String, store: String): Row = {
    val meta = spark.read.parquet(metaPath)
    check(meta, store)
    meta.collect()(0)
  }
}
