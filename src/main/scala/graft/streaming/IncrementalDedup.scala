package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.dedup.Dedup
import graft.functions.TextFunctions

/** Continuous exact dedup against a DURABLE fingerprint index — the
  * streaming face of [[Dedup.dedupAgainstIndex]] (q49's production
  * ingest flow). [[graft.pipeline.TrainingDataPipeline.cleanStream]]'s
  * `dropDuplicatesWithinWatermark` only suppresses duplicates while
  * state is live; here every micro-batch anti-joins the parquet
  * fingerprint store accumulated across ALL history, emits survivors,
  * and appends its own new fingerprints — a duplicate is dropped
  * whether it arrives seconds or months after the original, with
  * bounded (zero) streaming state.
  *
  * Scale shape per batch: the index side is a fingerprint-only scan
  * (16-byte rows; at 100 TB of corpus this is the small side by ~3
  * orders of magnitude), the anti-join shuffles ids+hashes, and the
  * batch's within-batch dups collapse by the min-id window — all
  * inherited from the batch operator. Use
  * [[Dedup.dedupAgainstIndexBloom]]'s explicit bloom variant inside
  * the batch body when the index outgrows the batch by enough that
  * pruning its scan matters.
  *
  * Replay safety (exactly-once): foreachBatch re-runs a failed batch
  * under the same batchId, and the failure can land AFTER the index
  * write but BEFORE the checkpoint commit. The index is therefore
  * partitioned by batch id (`indexDir/batch=N`) and each batch (a)
  * dedups against strictly EARLIER partitions only and (b) overwrites
  * its own partition. A replayed batch thus sees exactly the index its
  * first attempt saw — same survivors to `emit`, same fingerprints
  * rewritten — instead of anti-joining its own leftovers and emitting
  * zero rows (which, with the standard overwrite-per-batchId sink,
  * would silently erase the batch's survivors). `emit` must be
  * idempotent per batchId, the usual foreachBatch contract.
  */
object IncrementalDedup {

  private val seedSchema = StructType(Seq(StructField("fp", StringType)))

  /** Fingerprint partitions written by batches strictly before
    * `beforeBatch` (every batch when omitted); empty on the very first
    * batch (missing directory). Root-level data files (an index dir
    * seeded by a plain fp-only parquet write, e.g. a batch backfill)
    * count as OLDEST history (batch -1), so seeded history is never
    * silently ignored even once streamed `batch=N` partitions land
    * beside the seed files (the mixed layout [[BatchIndex]] exists
    * for). */
  def readIndex(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame = {
    val rows = BatchIndex.read(spark, indexDir, seedSchema, beforeBatch)
    // tombstone-masked, batch-ordered ([[Tombstones.maskLatest]]): a
    // deleted fingerprint stops suppressing future copies of its
    // document — the takedown-then-repost flow — but a fingerprint
    // RE-ADMITTED by a batch after the delete counts as history again
    // (else every later copy of the re-admitted doc would survive).
    // Delete-free stores keep their original plan (existence check).
    // Tombstone batches at or below the purge fence are skipped: a
    // completed purge swap already resolved them physically, and
    // re-applying them against the rewrite's re-dated rows (batch -1)
    // would re-kill re-admitted fingerprints the purge kept.
    if (!Tombstones.exists(spark, indexDir)) rows
    else Tombstones.maskLatest(rows,
      Tombstones.maxBatchPerKey(spark, indexDir, seedSchema, beforeBatch,
        afterBatch =
          Tombstones.readFence(spark, indexDir).getOrElse(Long.MinValue)),
      Seq("fp"))
  }

  /** Tombstone one batch of fingerprint DELETIONS — the takedown path
    * for the exact-dedup history: after the delete, new exact copies
    * of the document RE-ADMIT (the store no longer remembers it), and
    * [[purgeTombstones]] destroys the fingerprint bytes. `fps` is a
    * frame of fingerprint strings ([[graft.functions.TextFunctions.fingerprint]]
    * of the doc text — deletions usually arrive as documents, so
    * fingerprint the text to build this frame). Stored under the
    * shared [[Tombstones]] layout: stamped batch=N, fence-composable
    * under the store's batch clock. */
  def deleteBatch(
      spark: SparkSession, indexDir: String, fps: DataFrame,
      fpCol: String, batchId: Long): Unit =
    Tombstones.writeBatch(spark, indexDir,
      fps.select(col(fpCol).cast("string").as("fp")), batchId)

  /** Streaming DELETES: each micro-batch of fingerprints becomes one
    * tombstone batch under the stream's own batch ids — exactly-once
    * by the shared overwrite-idempotent layout. Start with
    * `.start()`. */
  def deleteStreamTo(
      fps: DataFrame, indexDir: String, checkpointDir: String,
      fpCol: String): DataStreamWriter[Row] =
    fps.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deleteBatch(batch.sparkSession, indexDir, batch, fpCol, batchId)
        ()
      }

  /** The raw tombstoned-fingerprint set (terminal reading; the masked
    * [[readIndex]] applies the batch-ordered one). */
  def liveTombstones(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    Tombstones.liveKeys(spark, indexDir, seedSchema, beforeBatch)

  /** PHYSICALLY remove tombstoned fingerprints — batch-ordered like
    * the masked read (a fingerprint re-admitted after its delete
    * keeps its later rows), via [[BatchIndex.rewriteAll]]'s staging+
    * journal protocol (crash-safe; reads refuse mid-swap), then drop
    * the tombstone store. The rewrite's journal also commits a PURGE
    * FENCE ([[Tombstones.fenceLine]]) recording the newest tombstone
    * batch resolved, atomically with the swap: a crash between the
    * completed swap and the tombstone drop leaves masked reads and
    * purge re-runs skipping the already-resolved batches — without it,
    * the re-dated survivors (seed batch -1) would flip re-admitted
    * fingerprints back to dead, and the re-run would destroy them.
    * Collapses batch fences by design. Requires the writing stream
    * stopped or between batches. */
  def purgeTombstones(spark: SparkSession, indexDir: String): Unit = {
    if (!Tombstones.exists(spark, indexDir)) {
      // a crash between the tombstone drop and the fence drop leaves a
      // satisfied fence behind; retire it here
      Tombstones.dropFence(spark, indexDir)
      return
    }
    // ONE lease spans the rewrite AND the tombstone drop: an appender
    // or rival maintenance pass landing between them would race the
    // exact window the fence protocol exists to survive
    val lease = MaintenanceLease.acquire(spark, indexDir,
      s"purge-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val fence = Tombstones.readFence(spark, indexDir).getOrElse(Long.MinValue)
      // pin the resolution horizon EAGERLY: everything below (the dead
      // set's read, the journaled fence, the bounded drop) names
      // batches <= through, so a takedown landing mid-purge survives
      // unresolved instead of being dropped with the store
      val through = Tombstones.maxTombstoneBatch(spark, indexDir, seedSchema)
        .getOrElse(Long.MinValue)
      val dead = Tombstones.maxBatchPerKey(spark, indexDir, seedSchema,
        beforeBatch = through + 1L, afterBatch = fence)
      if (!dead.isEmpty) {
        BatchIndex.rewriteAll(spark, indexDir, seedSchema,
          extraJournal = Seq(Tombstones.fenceLine(through)),
          heldBy = Some(lease.holder))(all =>
          Tombstones.maskLatest(all, dead, Seq("fp")))
      }
      if (!Tombstones.dropThrough(spark, indexDir, through))
        Tombstones.dropFence(spark, indexDir)
      // else: later takedown batches remain — the kept fence makes
      // masked reads skip the resolved ones; re-run purge to finish
    } finally MaintenanceLease.release(spark, lease)
  }

  /** Fold fingerprint partitions `<= throughBatch` into root-level
    * seed files ([[BatchIndex.compact]]): months of 5-minute batches
    * otherwise mean ~100k tiny `batch=N` directories listed per batch
    * — the small-file scale-killer on the index side of the anti-join.
    * Read-equivalent at every future fence; crash-safe via the
    * journal; requires the writing stream stopped or between batches. */
  def compactIndex(
      spark: SparkSession, indexDir: String, throughBatch: Long): Unit = {
    // masking is batch-ordered, and folding re-dates rows to the
    // seed's batch -1 — below any delete batch: compacting with
    // tombstones outstanding would silently flip a re-admitted
    // fingerprint from alive back to dead. Purge first (purge
    // resolves before the batch column is destroyed).
    if (Tombstones.exists(spark, indexDir))
      throw new IllegalStateException(
        s"$indexDir holds tombstones — purgeTombstones before " +
          "compactIndex: folding re-dates rows to the seed's batch -1, " +
          "which would flip batch-ordered delete resolution for " +
          "re-admitted fingerprints")
    BatchIndex.compact(spark, indexDir, seedSchema, throughBatch)
  }

  /** Retention: drop fingerprints admitted before `keepFromBatch`
    * (seed rows too when `dropSeed`) — exact copies of documents older
    * than the window are re-admitted, the bounded-window trade
    * [[BatchIndex.expire]] documents. */
  /** Time-based retention: drop fingerprint batches admitted before
    * `cutoffMillis` ([[BatchIndex.expireOlderThan]] — the wall-clock
    * face of [[expireIndex]]; admission times come from the per-batch
    * stamps the stream writes, FS mtime for pre-stamp stores). */
  def expireIndexOlderThan(
      spark: SparkSession, indexDir: String, cutoffMillis: Long,
      dropSeed: Boolean = false): Unit =
    BatchIndex.expireOlderThan(spark, indexDir, cutoffMillis, dropSeed)

  /** fsck: classify the store's partitions against the writing
    * stream's checkpoint ([[BatchIndex.verifyStore]] — orphans are
    * partitions no replay will ever correct). */
  def verifyIndex(
      spark: SparkSession, indexDir: String,
      checkpointDir: String): StoreCheck =
    BatchIndex.verifyStore(spark, indexDir, checkpointDir)

  /** Move every orphan [[verifyIndex]] reports under `_quarantine/`
    * (rename-only; [[BatchIndex.quarantineOrphans]]). */
  def quarantineIndexOrphans(
      spark: SparkSession, indexDir: String,
      checkpointDir: String): Seq[Long] =
    BatchIndex.quarantineOrphans(spark, indexDir, checkpointDir)

  def expireIndex(
      spark: SparkSession, indexDir: String,
      keepFromBatch: Long, dropSeed: Boolean = false): Unit =
    BatchIndex.expire(spark, indexDir, keepFromBatch, dropSeed)

  /** One micro-batch: survivors of `batch` against the index state as
    * of `beforeBatch` (also the batch-backfill entry point, so both
    * paths share one definition). */
  def dedupBatch(
      batch: DataFrame, indexDir: String, idCol: String, textCol: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    Dedup.dedupAgainstIndex(
      batch, readIndex(batch.sparkSession, indexDir, beforeBatch),
      idCol, textCol)

  /** Streaming writer: `emit` sees each batch's surviving documents,
    * then their fingerprints land in the batch's own index partition.
    * Start with `.start()`; outputMode is Update (per-batch deltas, no
    * global result table). */
  def dedupStreamToIndex(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: String)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // refuse while a maintenance lease is live: the batch fails
        // before any work, the checkpoint stays uncommitted, and the
        // batch replays intact once the lease clears
        MaintenanceLease.refuseIfHeld(
          batch.sparkSession, indexDir, s"append batch=$batchId")
        val fresh = dedupBatch(batch, indexDir, idCol, textCol, beforeBatch = batchId)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          emit(fresh, batchId)
          fresh.select(TextFunctions.fingerprint(col(textCol)).as("fp"))
            .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
          BatchIndex.stampBatch(batch.sparkSession, indexDir, batchId)
        } finally fresh.unpersist()
        ()
      }
}
