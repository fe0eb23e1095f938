package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.dedup.Dedup

/** Continuous NEAR-dedup against a durable LSH band index — the
  * streaming face of [[Dedup.jaccardOnCandidates]] (q43's wired
  * candidates->verify path), as [[IncrementalDedup]] is for exact
  * fingerprints. A document near-duplicating one admitted seconds or
  * months earlier is dropped, with zero Structured Streaming state:
  * all history lives in two batch-partitioned parquet stores,
  *
  *   `indexDir/bands/batch=N` — (id, band, bv), the admitted docs'
  *     LSH band values ([[Dedup.bandTable]] rows — nBands small rows
  *     per doc, the only thing candidate generation ever joins);
  *   `indexDir/docs/batch=N`  — (id, text), read ONLY for the docs an
  *     incoming candidate pair actually references (semi-join pruned),
  *     so the text store is never scanned wholesale.
  *
  * Per micro-batch:
  *  1. within-batch near-dedup: [[Dedup.jaccardOnCandidates]], drop
  *     the larger id of each verified pair (the pipeline's first-pass
  *     policy);
  *  2. cross-batch candidates: the batch survivors' band table joins
  *     the accumulated band index on (band, bv) — work bounded by band
  *     collisions, never |batch| x |history|;
  *  3. exact-Jaccard verify ([[Dedup.jaccardVerify]]) over the batch
  *     docs plus ONLY the referenced old docs; verified new ids drop;
  *  4. survivors emit, and their bands + texts land in the batch's own
  *     partitions.
  *
  * Scale shape: the band index row is ~20 bytes x nBands per admitted
  * doc; the per-batch join against it is runtime-pruned by the batch's
  * own (band, bv) set on the build side and inherits AQE skew handling;
  * a degenerate band value in the HISTORY is capped with the same
  * `maxBucket` the in-batch path uses (band values over maxBucket
  * admitted docs are pruned before the candidate join). Exact
  * duplicates are a special case (identical signatures collide in
  * every band, Jaccard 1 verifies), so no separate fingerprint pass is
  * needed.
  *
  * Replay safety: identical to [[IncrementalDedup]] — each batch
  * dedups against strictly EARLIER partitions only and overwrites its
  * own two partitions, so a post-write pre-commit crash replays to the
  * same survivors. `emit` must be idempotent per batchId. Ids must be
  * longs and text a string (the stored schemas).
  */
object NearDedupStream {

  private val bandsSchema = StructType(Seq(
    StructField("id", LongType), StructField("band", IntegerType),
    StructField("bv", StringType)))
  private val docsSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  /** Band rows admitted by batches strictly before `beforeBatch`.
    * Root-level seed files (a backfill's [[Dedup.bandTable]] dump)
    * read as oldest history, exactly like [[IncrementalDedup]]. */
  private val idSchema = StructType(Seq(StructField("id", LongType)))

  /** Tombstone-masked, batch-ordered read of one of the pair's two
    * stores ([[Tombstones.maskLatest]] over the SHARED tombstone set
    * at the index root): a deleted doc's bands stop generating
    * candidates and its text stops being fetched for verification —
    * its near-duplicates RE-ADMIT, the takedown contract — while a
    * doc re-ingested after its delete (the id-reuse guard permits it
    * precisely because the masked bands no longer admit the id)
    * counts as history again. Delete-free stores keep their original
    * plan. */
  private def maskedRead(
      spark: SparkSession, indexDir: String, sub: String,
      schema: StructType, beforeBatch: Long): DataFrame = {
    val rows = BatchIndex.read(spark, s"$indexDir/$sub", schema, beforeBatch)
    // each sub-store carries its OWN purge fence: a crash between the
    // docs and bands rewrites leaves docs re-dated (fenced — tombstones
    // <= fence no longer apply there, matching the physical resolution)
    // while bands still mask the full set; re-applying resolved
    // tombstones to the re-dated store would re-kill re-ingested ids.
    if (!Tombstones.exists(spark, indexDir)) rows
    else Tombstones.maskLatest(rows,
      Tombstones.maxBatchPerKey(spark, indexDir, idSchema, beforeBatch,
        afterBatch = Tombstones.readFence(spark, s"$indexDir/$sub")
          .getOrElse(Long.MinValue)),
      Seq("id"))
  }

  def readBands(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    maskedRead(spark, indexDir, "bands", bandsSchema, beforeBatch)

  /** Admitted (id, text) rows, same fence/seed semantics. */
  def readDocs(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    maskedRead(spark, indexDir, "docs", docsSchema, beforeBatch)

  /** Tombstone one batch of doc-id DELETIONS — the takedown path for
    * the near-dedup history: the deleted docs' bands and text leave
    * every read ([[readBands]]/[[readDocs]] mask batch-ordered), so
    * their near-duplicates re-admit and the id becomes re-ingestable;
    * [[purgeTombstones]] then destroys the bytes. One tombstone set
    * at the index root covers BOTH stores. */
  def deleteBatch(
      spark: SparkSession, indexDir: String, ids: DataFrame,
      idCol: String, batchId: Long): Unit =
    Tombstones.writeBatch(spark, indexDir,
      ids.select(col(idCol).cast("long").as("id")), batchId)

  /** Streaming DELETES: each micro-batch of ids becomes one tombstone
    * batch under the stream's own batch ids — exactly-once by the
    * shared overwrite-idempotent layout. Start with `.start()`. */
  def deleteStreamTo(
      ids: DataFrame, indexDir: String, checkpointDir: String,
      idCol: String): DataStreamWriter[Row] =
    ids.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deleteBatch(batch.sparkSession, indexDir, batch, idCol, batchId)
        ()
      }

  /** The raw tombstoned-id set (terminal reading; the masked reads
    * apply the batch-ordered one). */
  def liveTombstones(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    Tombstones.liveKeys(spark, indexDir, idSchema, beforeBatch)

  /** PHYSICALLY remove tombstoned docs from BOTH stores — batch-
    * ordered like the masked reads, each rewrite under
    * [[BatchIndex.rewriteAll]]'s staging+journal protocol. Docs purge
    * FIRST (the text is the sensitive payload; a crash between the
    * two rewrites leaves only 16-byte band values, and re-running
    * purge completes — the tombstone store is dropped LAST, only
    * after both rewrites land). A deleted-doc band surviving such a
    * crash window is also semantically harmless: its candidates
    * verify against missing text and fail, which is the purged
    * outcome. Each rewrite's journal commits that store's PURGE FENCE
    * atomically with its swap ([[Tombstones.fenceLine]]), so in every
    * crash window the half-purged pair serves exactly: the swapped
    * store skips the resolved tombstones (its re-dated rows would
    * otherwise flip re-ingested ids back to dead), the unswapped one
    * still masks them, and the re-run completes only the missing
    * rewrite. Collapses batch fences by design; requires the writing
    * stream stopped or between batches. */
  def purgeTombstones(spark: SparkSession, indexDir: String): Unit = {
    if (!Tombstones.exists(spark, indexDir)) {
      // a crash between the tombstone drop and the fence drops leaves
      // satisfied fences behind; retire them here
      Seq("docs", "bands")
        .foreach(s => Tombstones.dropFence(spark, s"$indexDir/$s"))
      return
    }
    // ONE holder leases BOTH sub-stores for the whole sequence (two
    // rewrites + the shared tombstone drop): an appender writes the
    // docs/bands pair together, so freezing one store alone would
    // still let a batch land half its rows under the other's swap
    val holder = s"purge-${java.util.UUID.randomUUID().toString.take(8)}"
    // the root lease additionally freezes the shared tombstone store
    // (Tombstones.writeBatch refuses against it)
    val leases = Seq(indexDir, s"$indexDir/docs", s"$indexDir/bands")
      .map(d => MaintenanceLease.acquire(spark, d, holder))
    try {
      // the resolution horizon is pinned EAGERLY and bounds both
      // rewrites' dead reads, the journaled fences, and the drop — a
      // takedown landing mid-purge survives unresolved (kept batches
      // keep masking; the kept fences stop the resolved ones from
      // re-killing re-ingested ids against the re-dated stores)
      val through = Tombstones.maxTombstoneBatch(spark, indexDir, idSchema)
      through.foreach { t =>
        // each rewrite resolves only the tombstone batches ABOVE that
        // store's own fence and commits the new fence IN its journal
        // ([[Tombstones.fenceLine]]) — so a re-run after a crash between
        // the two rewrites skips the store already swapped instead of
        // re-applying resolved tombstones to its re-dated rows
        Seq(("docs", docsSchema), ("bands", bandsSchema)).foreach {
          case (sub, schema) =>
            val dead = Tombstones.maxBatchPerKey(spark, indexDir, idSchema,
              beforeBatch = t + 1L,
              afterBatch = Tombstones.readFence(spark, s"$indexDir/$sub")
                .getOrElse(Long.MinValue))
            if (!dead.isEmpty)
              BatchIndex.rewriteAll(spark, s"$indexDir/$sub", schema,
                extraJournal = Seq(Tombstones.fenceLine(t)),
                heldBy = Some(holder))(all =>
                Tombstones.maskLatest(all, dead, Seq("id")))
        }
      }
      val remaining = Tombstones.dropThrough(
        spark, indexDir, through.getOrElse(Long.MinValue))
      if (!remaining)
        Seq("docs", "bands")
          .foreach(s => Tombstones.dropFence(spark, s"$indexDir/$s"))
    } finally leases.foreach(MaintenanceLease.release(spark, _))
  }

  /** Seed the durable index from an already-admitted corpus — the
    * batch-backfill entry a deployment runs ONCE before switching to
    * the stream: band rows and texts land as ROOT-level seed files,
    * which every batch fence reads as oldest history (batch -1). The
    * LSH parameters must match the ones the stream will use — bands
    * generated under different (shingleN, nHashes, rowsPerBand) don't
    * collide correctly and the seed would be silently useless.
    *
    * Refuses an index that already holds STREAMED `batch=N` partitions:
    * the overwrite seed write would erase months of accumulated
    * history and void the durable-dedup guarantee — re-seeding a
    * seed-only index (re-running a backfill) is fine. */
  def backfillIndex(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      shingleN: Int = 3, nHashes: Int = 8, rowsPerBand: Int = 2): Unit = {
    val spark = docs.sparkSession
    Seq("bands", "docs").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p) && fs.listStatus(p).exists(e =>
          e.isDirectory && e.getPath.getName.startsWith("batch=")))
        throw new IllegalStateException(
          s"$indexDir/$sub already holds streamed batch=N partitions — " +
            "backfillIndex would erase that history; seed a fresh index " +
            "dir or let the stream continue from the existing one")
      // a crashed compaction may have already deleted every batch=N dir;
      // the journal + staged rows are then the only copy of that history
      // and the overwrite below would destroy them — refuse instead
      if (fs.exists(new org.apache.hadoop.fs.Path(p, BatchIndex.Marker)))
        throw new IllegalStateException(
          s"$indexDir/$sub holds a compaction journal — complete the " +
            "pending compactIndex before re-seeding")
    }
    // docs BEFORE bands: a crash between the two writes must never
    // leave band rows whose texts are missing — a candidate referencing
    // such a doc would find no shingles and silently verify as
    // non-duplicate, admitting near-dups of the seed corpus. Docs
    // without bands are the harmless direction (they just never become
    // candidates until the backfill is re-run).
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .write.mode("overwrite").parquet(s"$indexDir/docs")
    Dedup.bandTable(
        Dedup.minhashSignature(docs, idCol, textCol, nHashes, shingleN),
        idCol, nHashes, rowsPerBand)
      .write.mode("overwrite").parquet(s"$indexDir/bands")
  }

  /** Fold both stores' `batch=N` partitions `<= throughBatch` into
    * root-level seed files ([[BatchIndex.compact]] — bounds the
    * directory listing a long-running stream pays per batch without
    * changing what any future fence reads). Docs compact BEFORE bands,
    * the same crash-ordering argument as [[backfillIndex]]: if the
    * second rewrite crashes, its journal makes reads of THAT store fail
    * loudly until compact is re-run, and the already-compacted docs
    * store is visible at every fence the partitioned one was. Requires
    * the writing stream stopped or between batches. */
  def compactIndex(
      spark: SparkSession, indexDir: String, throughBatch: Long): Unit = {
    // masking is batch-ordered over the shared tombstone set, and
    // folding re-dates rows to the seed's batch -1 — below any delete
    // batch: compacting with tombstones outstanding would silently
    // flip a re-ingested id from alive back to dead in BOTH stores.
    // Purge first (purge resolves before the batch column dies).
    if (Tombstones.exists(spark, indexDir))
      throw new IllegalStateException(
        s"$indexDir holds tombstones — purgeTombstones before " +
          "compactIndex: folding re-dates rows to the seed's batch -1, " +
          "which would flip batch-ordered delete resolution for " +
          "re-ingested ids")
    BatchIndex.compact(spark, s"$indexDir/docs", docsSchema, throughBatch)
    BatchIndex.compact(spark, s"$indexDir/bands", bandsSchema, throughBatch)
  }

  /** Retention: drop history admitted before `keepFromBatch` (seed rows
    * too when `dropSeed`) from both stores — documents older than the
    * window stop producing near-dup candidates, so their variants are
    * re-admitted. Bands expire BEFORE docs (the reverse of backfill's
    * ordering, for the same reason): a crash between the two deletes
    * must never leave bands whose docs are gone — such a candidate
    * would fetch no text and silently verify as non-duplicate even for
    * ids INSIDE the window. Band-less docs merely linger until the next
    * expire call. */
  def expireIndex(
      spark: SparkSession, indexDir: String,
      keepFromBatch: Long, dropSeed: Boolean = false): Unit = {
    BatchIndex.expire(spark, s"$indexDir/bands", keepFromBatch, dropSeed)
    BatchIndex.expire(spark, s"$indexDir/docs", keepFromBatch, dropSeed)
  }

  /** Time-based [[expireIndex]]: the cutoff resolves to a batch fence
    * ONCE, against the bands store's admission stamps, and the same
    * fence expires both stores — resolving per-store could land on two
    * different fences (stamps are written docs-then-bands) and break
    * the bands-never-outlive-docs crash invariant the ordering above
    * protects. */
  def expireIndexOlderThan(
      spark: SparkSession, indexDir: String, cutoffMillis: Long,
      dropSeed: Boolean = false): Unit =
    BatchIndex.keepFromForCutoff(spark, s"$indexDir/bands", cutoffMillis)
      .foreach(k => expireIndex(spark, indexDir, k, dropSeed))

  /** fsck per store: classify both stores' partitions against the
    * writing stream's checkpoint ([[BatchIndex.verifyStore]]). The two
    * reports can legitimately differ by ONE pending id — a crash
    * between the docs and bands writes of a batch leaves docs without
    * bands, healed by the stream's replay — but an orphan in either
    * store is permanent until quarantined. */
  def verifyIndex(
      spark: SparkSession, indexDir: String,
      checkpointDir: String): Map[String, StoreCheck] = Map(
    "docs" -> BatchIndex.verifyStore(spark, s"$indexDir/docs", checkpointDir),
    "bands" -> BatchIndex.verifyStore(spark, s"$indexDir/bands", checkpointDir))

  /** Quarantine the UNION of both stores' orphans from both stores —
    * one id set, two stores, so the pair stays aligned. Bands move
    * first (the expire ordering's invariant: a crash between the two
    * passes must never leave bands whose docs are gone). */
  def quarantineIndexOrphans(
      spark: SparkSession, indexDir: String,
      checkpointDir: String): Seq[Long] = {
    val orphans = verifyIndex(spark, indexDir, checkpointDir)
      .values.flatMap(_.orphans).toSet
    BatchIndex.quarantineBatches(spark, s"$indexDir/bands", orphans)
    BatchIndex.quarantineBatches(spark, s"$indexDir/docs", orphans)
    orphans.toSeq.sorted
  }

  /** One micro-batch: survivors of `batch` against the index state as
    * of `beforeBatch` (also the batch-backfill entry point — both
    * paths share this definition). Steps 1-3 of the object doc.
    *
    * One-shot callers only: the batch's localCheckpoint blocks are
    * left to the ContextCleaner here (they cannot be freed before the
    * returned frame is consumed). A LOOP over many batches should go
    * through the streaming writer, which frees each batch's blocks
    * deterministically via the core's cleanup thunk. */
  def nearDedupBatch(
      batch: DataFrame, indexDir: String, idCol: String, textCol: String,
      beforeBatch: Long = Long.MaxValue,
      p: Int = 1, q: Int = 2, shingleN: Int = 3,
      nHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100000): DataFrame =
    dedupBatchWithBands(batch, indexDir, idCol, textCol, beforeBatch,
      p, q, shingleN, nHashes, rowsPerBand, maxBucket).survivors

  /** What the batch core hands back: the survivors, the batch's
    * materialized band table (the stream writer derives the survivors'
    * index rows from it without re-tokenizing), and a cleanup thunk
    * that frees the batch's localCheckpoint block-manager storage —
    * call it AFTER every consumer of `survivors`/`bands` has run, or a
    * long-lived stream accumulates checkpointed blocks until the
    * ContextCleaner happens to GC them. */
  private[graft] final case class BatchCore(
      survivors: DataFrame, bands: DataFrame, cleanup: () => Unit)

  /** Free a localCheckpoint'ed frame's blocks deterministically: the
    * checkpointed Dataset is a scan of a LogicalRDD whose RDD holds the
    * persisted blocks — unpersist that RDD. (Dataset.unpersist only
    * covers CacheManager entries, not checkpoints.) Must not be called
    * while a consumer may still read the frame. */
  private[graft] def dropLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** The batch core. Tokenization runs ONCE over the batch (the
    * materialized shingle table feeds the signature AND both verify
    * passes — lazy lineage would re-run the whole tokenize pipeline per
    * consumer) and once over the candidate-referenced old docs.
    *
    * Id integrity: a batch doc reusing an ADMITTED doc's id would merge
    * two token streams under one id inside shingle verification and
    * corrupt every pair that references it — silently. Correct
    * operation (globally unique ids, replay behind the batch fence)
    * never trips this, so it throws rather than guessing; the check
    * rides the band index rows the batch is reading anyway. */
  private[graft] def dedupBatchWithBands(
      batch: DataFrame, indexDir: String, idCol: String, textCol: String,
      beforeBatch: Long,
      p: Int, q: Int, shingleN: Int,
      nHashes: Int, rowsPerBand: Int,
      maxBucket: Int): BatchCore = {
    val spark = batch.sparkSession
    // ONE tokenize pass over the batch
    val sh = Dedup.shingleTable(batch, idCol, textCol, shingleN)
      .withColumnRenamed(idCol, "id")
      .localCheckpoint()
    val bands = Dedup.bandTable(
        Dedup.minhashFromShingles(sh, "id", nHashes), "id", nHashes, rowsPerBand)
      .localCheckpoint()
    // 1. within-batch: verified pairs come out id_a < id_b, drop id_b
    val withinPairs = Dedup.jaccardVerifyOnShingles(
      sh, Dedup.lshCandidatesFromBands(bands, maxBucket), p, q)
    val within = batch.join(
        withinPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .localCheckpoint()
    val withinIds = within.select(col(idCol).cast("long").as("id"))
    // 2. cross-batch candidates: (old admitted id, new id) per shared
    // band. The index side gets the SAME hot-bucket cap the in-batch
    // path applies (lshCandidatesFromBands' maxBucket): a degenerate
    // band value accumulated over months of history would otherwise fan
    // the join out by |hot history| x |batch collisions|. Band values
    // held by more than maxBucket admitted docs carry no near-dup
    // signal and are pruned before the join — the standard
    // recall-for-boundedness trade.
    //
    // The accumulated band index — the largest input, growing every
    // batch — is scanned and shuffled exactly ONCE per batch: the hot
    // cap is a windowed count partitioned by (band, bv), the candidate
    // join's own key, so the window's exchange satisfies the join's
    // required distribution and no second scan (a separate groupBy
    // branch) or second shuffle exists on the history side.
    //
    // The id-reuse guard rides that same single pass, at ZERO extra
    // jobs (it used to be a separate limit(1).count() action per
    // batch): old band rows whose id the batch re-uses are flagged by
    // a join against the batch's id set (small side, runtime-broadcast
    // by AQE), and a flagged row turns its join-key column into
    // raise_error — evaluated for every old row as the pass projects
    // it, so any reuse fails the batch's own job loudly before the
    // index writes commit. The guard sits BEFORE the hot-band filter,
    // so a reused id raises even when all its band values are hot-
    // pruned. One edge is consciously narrower than a standalone
    // check: a batch whose EVERY doc is unbandable (all null/short
    // texts) plans an empty candidate join, AQE skips the history
    // scan, and a reused id in it goes undetected — such a batch also
    // generates no pairs, so nothing corrupts within it; the first
    // bandable batch touching that id still raises.
    val withinFlag = withinIds.withColumn("_reused", lit(true))
    val bandW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bv"))
    val oldBands = readBands(spark, indexDir, beforeBatch)
      .join(withinFlag, Seq("id"), "left")
      .withColumn("bv", when(col("_reused"),
          raise_error(concat(
            lit("batch reuses doc id "), col("id").cast("string"),
            lit(" already admitted to the near-dedup index at " + indexDir +
              " — ids must be globally unique (replaying a batch needs its " +
              "beforeBatch fence; see the replay-safety contract)"))))
        .otherwise(col("bv")))
      .drop("_reused")
      .withColumn("_n", count(lit(1)).over(bandW))
      .filter(col("_n") <= maxBucket)
      .drop("_n")
    val newBands = bands.join(withinIds, Seq("id"), "left_semi")
    val cand = newBands.as("nb")
      .join(oldBands.as("ob"), Seq("band", "bv"))
      .select(col("ob.id").as("id_a"), col("nb.id").as("id_b"))
      .distinct()
    // 3. verify on exact shingle sets: old texts fetched (and
    // tokenized) ONLY for referenced candidates; the batch side reuses
    // the materialized shingle table
    val oldSh = Dedup.shingleTable(
      readDocs(spark, indexDir, beforeBatch)
        .join(cand.select(col("id_a").as("id")), Seq("id"), "left_semi")
        .select(col("id"), col("text")),
      "id", "text", shingleN)
    val verifySh = sh.join(withinIds, Seq("id"), "left_semi")
      .unionByName(oldSh)
    val dropped = Dedup.jaccardVerifyOnShingles(verifySh, cand, p, q)
      .select(col("id_b").as(idCol)).distinct()
    BatchCore(
      within.join(dropped, Seq(idCol), "left_anti"), bands,
      () => Seq(sh, bands, within).foreach(dropLocalCheckpoint))
  }

  /** Streaming writer: `emit` sees each batch's surviving documents,
    * then their bands and texts land in the batch's own index
    * partitions. Start with `.start()`. */
  def nearDedupStreamToIndex(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: String,
      p: Int = 1, q: Int = 2, shingleN: Int = 3,
      nHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100000)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // refuse while either sub-store is under a maintenance lease:
        // the batch fails before any work, the checkpoint stays
        // uncommitted, and it replays intact once the lease clears
        Seq("docs", "bands").foreach(s => MaintenanceLease.refuseIfHeld(
          batch.sparkSession, s"$indexDir/$s", s"append batch=$batchId"))
        val core = dedupBatchWithBands(
          batch, indexDir, idCol, textCol, batchId,
          p, q, shingleN, nHashes, rowsPerBand, maxBucket)
        val fresh = core.survivors
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          emit(fresh, batchId)
          // docs before bands (the backfill crash-ordering argument);
          // the batch's band table is already materialized — the index
          // rows are a semi-join restriction to the final survivors,
          // not another tokenize pass
          fresh.select(col(idCol).as("id"), col(textCol).as("text"))
            .write.mode("overwrite").parquet(s"$indexDir/docs/batch=$batchId")
          core.bands.join(fresh.select(col(idCol).cast("long").as("id")),
              Seq("id"), "left_semi")
            .write.mode("overwrite").parquet(s"$indexDir/bands/batch=$batchId")
          // bands last, stamps after both: a crash before the stamps
          // costs only the mtime fallback's accuracy
          BatchIndex.stampBatch(batch.sparkSession, s"$indexDir/docs", batchId)
          BatchIndex.stampBatch(batch.sparkSession, s"$indexDir/bands", batchId)
        } finally {
          fresh.unpersist()
          core.cleanup() // free the batch's localCheckpoint blocks now,
                         // not whenever the ContextCleaner GCs them
        }
        ()
      }
}
