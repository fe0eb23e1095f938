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
  *  - field == a KNOWN older generation with a shipped shim: opens
  *    routed through [[migrated]] serve the meta re-shaped into the
  *    current layout (the 0 -> 1 `sketch_seed` rename is the first
  *    real shim, spec-gated read-equivalent to a native store);
  *  - anything else: refuse LOUDLY at open with an upgrade note,
  *    instead of serving rows under layout assumptions that no longer
  *    hold.
  *
  * When a layout change ships, [[Version]] bumps and [[migrated]] is
  * where the next shim hooks — the 0 -> 1 path is the proven pattern.
  */
private[graft] object StoreLayout {

  /** The store layout generation this build writes and reads. */
  val Version = 1L

  /** Stamp a store's meta frame with the current layout version
    * (appended LAST, so positional readers of older fields stay
    * valid). */
  def stamp(meta: DataFrame): DataFrame =
    meta.withColumn("layout_version", lit(Version))

  /** The stamped version, or None for a pre-versioning meta (no
    * field — layout 1 by definition). A NULL version (partially
    * written or hand-doctored meta) is a foreign/corrupt layout and
    * refuses with the loud upgrade note — never a bare NPE far from
    * the cause. */
  private def versionOf(meta: DataFrame, store: String): Option[Long] =
    if (!meta.columns.contains("layout_version")) None
    else {
      val row = meta.select(col("layout_version").cast("long")).collect()(0)
      if (row.isNullAt(0)) throw new IllegalStateException(
        s"$store carries a NULL store-layout version (partially written " +
          s"or corrupt meta); this build reads version $Version — " +
          "re-seed/rebuild the store from its source data")
      Some(row.getLong(0))
    }

  private def upgradeError(store: String, v: Long) = new IllegalStateException(
    s"$store was written by store-layout version $v; this build " +
      s"reads version $Version — re-seed/rebuild the store from its " +
      "source data, open it with a build of the matching layout, or " +
      "open through StoreLayout.migrated if a migration shim ships " +
      "for this generation (the 0->1 sketch_seed rename is the pattern)")

  /** Validate an already-loaded meta frame against [[Version]].
    * VALIDATE-ONLY: callers keep reading the ORIGINAL frame, so a
    * generation that needs a column shim must refuse here and be
    * opened through [[migrated]] instead — check() accepting a
    * migratable version would hand the caller the un-migrated
    * columns. */
  def check(meta: DataFrame, store: String): Unit =
    versionOf(meta, store) match {
      case None | Some(Version) => ()
      case Some(v) => throw upgradeError(store, v)
    }

  /** Open a meta frame ACROSS layout generations: current (or
    * pre-versioning) metas pass through; a KNOWN older generation is
    * migrated in place and re-stamped; anything else refuses with
    * the upgrade note. The one shipped shim is 0 -> 1: the layout-0
    * prototype named the sketch seed column `sketch_seed`, layout 1
    * calls it `seed` (a pure rename, so positional readers of the
    * other fields stay valid). A version-0 meta WITHOUT that marker
    * column is not actually layout 0 — refuse rather than guess. */
  def migrated(meta: DataFrame, store: String): DataFrame =
    versionOf(meta, store) match {
      case None | Some(Version) => meta
      case Some(0L) if meta.columns.contains("sketch_seed") =>
        meta.withColumnRenamed("sketch_seed", "seed")
          .withColumn("layout_version", lit(Version))
      case Some(v) => throw upgradeError(store, v)
    }

  /** Read a store's meta, check-and-migrate the layout, return the
    * (single) meta row — the one-call shape for readers that already
    * collect it. Routed through [[migrated]], so a known older
    * generation serves its row in the CURRENT layout's column shape. */
  def checkedMetaRow(
      spark: SparkSession, metaPath: String, store: String): Row = {
    val meta = migrated(spark.read.parquet(metaPath), store)
    meta.collect()(0)
  }
}
