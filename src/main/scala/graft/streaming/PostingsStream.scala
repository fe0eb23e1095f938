package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.corpus.TextRetrieval

/** Continuous BM25 index maintenance — the durable-index streaming
  * story applied to lexical retrieval: documents arriving on a stream
  * are tokenized ONCE into (doc_id, term, tf) postings rows that land
  * in the batch's own partition of a [[BatchIndex]] store, and a probe
  * serves BM25 top-k over everything admitted before any fence from
  * the stored rows alone — the documents are never re-read, never
  * re-tokenized.
  *
  * Unlike ANN (where streamed cells approximate under a pinned
  * quantizer), incremental BM25 is EXACT: every statistic the score
  * needs — per-term document frequency, per-doc length, corpus size,
  * total length — is an associative integer aggregate of postings
  * rows, so scoring the union of stored batches is identical to
  * re-scoring the union corpus from scratch
  * ([[TextRetrieval.bm25TopKFromPostings]]'s contract, q103's oracle
  * gate: the served ranking matches the batch operator verbatim).
  *
  * The store inherits [[BatchIndex]]'s whole lifecycle: root seed
  * files read as oldest history, `batch=N` partitions per micro-batch,
  * replay via the strictly-earlier fence + own-partition overwrite,
  * journaled [[compactIndex]] folding old batches into seed files, and
  * [[expireIndex]] retention for bounded-window retrieval.
  *
  * Id contract (shared with every durable store here): doc ids are
  * globally unique across batches — a re-ingested id would double its
  * postings and inflate its scores. Replaying a batch under its own
  * fence is the supported way to re-process.
  */
object PostingsStream {

  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("term", StringType),
    StructField("tf", LongType)))

  /** Postings admitted by batches strictly before `beforeBatch`. */
  def readPostings(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    BatchIndex.read(spark, indexDir, postingsSchema, beforeBatch)

  /** Seed the store from a static corpus (root-level seed files, read
    * as oldest history). Refuses a store already holding streamed
    * `batch=N` partitions — same contract as
    * [[NearDedupStream.backfillIndex]]. */
  def backfillIndex(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String): Unit = {
    val spark = docs.sparkSession
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && fs.listStatus(p).exists(e =>
        e.isDirectory && e.getPath.getName.startsWith("batch=")))
      throw new IllegalStateException(
        s"$indexDir already holds streamed batch=N partitions — " +
          "backfillIndex would erase that history; seed a fresh dir or " +
          "let the stream continue from the existing one")
    // a crashed compaction may have deleted every batch=N dir already —
    // the journal (and its staged rows) are then the ONLY copy of the
    // folded history, and the root overwrite below would destroy them
    if (fs.exists(new org.apache.hadoop.fs.Path(p, BatchIndex.Marker)))
      throw new IllegalStateException(
        s"$indexDir holds a compaction journal — complete the pending " +
          "compactIndex before re-seeding; overwriting now would destroy " +
          "the staged history the journal protects")
    TextRetrieval.postings(docs, idCol, textCol)
      .write.mode("overwrite").parquet(indexDir)
  }

  /** Ingest one batch (also the numbered-batch backfill entry).
    * Refuses while a maintenance lease is live — a partition landing
    * during a stage-and-swap would be deleted by the journal's replay;
    * the failed foreachBatch replays intact once the lease clears. */
  def appendBatch(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      batchId: Long): Unit = {
    MaintenanceLease.refuseIfHeld(
      docs.sparkSession, indexDir, s"append batch=$batchId")
    TextRetrieval.postings(docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    BatchIndex.stampBatch(docs.sparkSession, indexDir, batchId)
  }

  /** Streaming writer: tokenize each micro-batch once into its own
    * postings partition. Start with `.start()`. */
  def postingsStreamTo(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: String)(
      emit: (DataFrame, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, idCol, textCol, indexDir, batchId)
        emit(batch, batchId)
        ()
      }

  /** Fold `batch<=N` partitions into root seed files ([[BatchIndex.compact]]
    * — journaled, crash-safe, read-equivalent at every later fence).
    * Safe WITH tombstones outstanding, unlike the batch-ordered
    * stores (vector/fingerprint/near-dedup compaction refuses then):
    * this store's tombstones are a TERMINAL id set — membership does
    * not depend on the postings rows' batch column — so folding
    * re-dates nothing the mask reads. */
  def compactIndex(
      spark: SparkSession, indexDir: String, throughBatch: Long): Unit =
    BatchIndex.compact(spark, indexDir, postingsSchema, throughBatch)

  /** Drop postings of batches before `keepFromBatch` — bounded-window
    * retrieval; expired documents stop matching. */
  def expireIndex(
      spark: SparkSession, indexDir: String,
      keepFromBatch: Long, dropSeed: Boolean = false): Unit =
    BatchIndex.expire(spark, indexDir, keepFromBatch, dropSeed)

  /** Time-based [[expireIndex]]: drop postings batches admitted before
    * `cutoffMillis` ([[BatchIndex.expireOlderThan]]). */
  def expireIndexOlderThan(
      spark: SparkSession, indexDir: String, cutoffMillis: Long,
      dropSeed: Boolean = false): Unit =
    BatchIndex.expireOlderThan(spark, indexDir, cutoffMillis, dropSeed)

  // ---- document deletes (the takedown path, mirroring the vector
  // store's q249/q251 lifecycle, on the shared [[Tombstones]]
  // sub-store): tombstone doc ids, subtract them from every serve,
  // then physically purge. BM25's statistics are associative integer
  // aggregates of postings rows (the q103 design point), so removing
  // a doc's rows re-derives N/avgdl/df/tf EXACTLY as if the doc had
  // never been ingested — deletion is decrementable by construction,
  // no special-casing in the scorer. The TERMINAL tombstone reading
  // applies: this store's id contract FORBIDS re-ingesting a doc id
  // (it would double its postings), so a tombstone holds until purge.
  private val tombstoneSchema = StructType(Seq(StructField("doc_id", LongType)))

  /** Tombstone one batch of doc-id DELETIONS (user deletion requests,
    * revoked licenses, recalled documents). Stored as `batch=N` under
    * `_tombstones/` with admission stamps, so retention fences and
    * as-of reads compose: a read pinned before the delete batch still
    * serves the document, the live read does not. */
  def deleteBatch(
      spark: SparkSession, indexDir: String, ids: DataFrame,
      idCol: String, batchId: Long): Unit =
    Tombstones.writeBatch(spark, indexDir,
      ids.select(col(idCol).cast("long").as("doc_id")), batchId)

  /** Streaming DELETES: each micro-batch of ids becomes one tombstone
    * batch under the stream's own batch ids — exactly-once by the
    * same overwrite-idempotent layout the postings appender uses.
    * Start with `.start()`. */
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

  /** The tombstoned doc-id set — distinct over every delete batch
    * strictly before `beforeBatch`; empty when the store has never
    * seen a delete. Terminal semantics (see the id contract above).
    * The fence assumes deletes and appends share one batch clock (one
    * CDC feed, or coordinated manual ids) — the same contract as the
    * vector store's fenced tombstones. */
  def liveTombstones(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    Tombstones.liveKeys(spark, indexDir, tombstoneSchema, beforeBatch)

  /** Postings minus the fenced tombstone set — what every serve
    * scores from. The existence check keeps delete-free stores on
    * their original plan (no empty-set anti-join on the hot path);
    * the tombstone set is broadcast (small by contract: purge folds
    * it away). */
  private def livePostings(
      spark: SparkSession, indexDir: String, beforeBatch: Long): DataFrame = {
    val tf = readPostings(spark, indexDir, beforeBatch)
      .select(col("doc_id"), col("term"), col("tf"))
    if (!Tombstones.exists(spark, indexDir)) tf
    else tf.join(broadcast(liveTombstones(spark, indexDir, beforeBatch)),
      Seq("doc_id"), "left_anti")
  }

  /** PHYSICALLY remove tombstoned documents — the completion of the
    * delete path (a takedown is not done while the postings remain on
    * disk): rewrite the WHOLE store (seed + every batch) into fresh
    * seed files minus the tombstoned ids via [[BatchIndex.rewriteAll]]
    * (compaction's exact staging+journal protocol — a crash before
    * the journal leaves the old layout, one after it is completed by
    * the next maintenance call, reads refuse loudly in between), then
    * drop the tombstone store. Collapses batch fences by design —
    * physical deletion destroys fenced history too; after a purge,
    * as-of reads see only the purged seed. Purging EVERY document is
    * allowed (unlike the vector store, reads here carry an explicit
    * schema, so an empty store serves empty results instead of
    * crashing on inference). Requires the writing stream stopped or
    * between batches. */
  def purgeTombstones(spark: SparkSession, indexDir: String): Unit = {
    if (!Tombstones.exists(spark, indexDir)) return
    // one lease spans the rewrite and the tombstone drop
    val lease = MaintenanceLease.acquire(spark, indexDir,
      s"purge-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      // pin the resolution horizon eagerly: the dead read and the drop
      // are both bounded to batches <= through, so a takedown landing
      // mid-purge survives unresolved (terminal tombstones — the kept
      // batch simply keeps masking until the next purge)
      val through = Tombstones.maxTombstoneBatch(
        spark, indexDir, tombstoneSchema).getOrElse(Long.MinValue)
      val dead = liveTombstones(spark, indexDir, beforeBatch = through + 1L)
      if (!dead.isEmpty) {
        BatchIndex.rewriteAll(spark, indexDir, postingsSchema,
          heldBy = Some(lease.holder))(all =>
          all.join(broadcast(dead), Seq("doc_id"), "left_anti"))
      }
      Tombstones.dropThrough(spark, indexDir, through)
      ()
    } finally MaintenanceLease.release(spark, lease)
  }

  /** fsck: classify the store's partitions against the writing
    * stream's checkpoint ([[BatchIndex.verifyStore]]). An orphan
    * postings partition silently inflates df/corpus statistics for
    * every query, so verify after any non-clean shutdown. */
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

  /** BM25 top-k served from the store at a fence — exact, see the
    * object doc. Tombstoned documents ([[deleteBatch]]) are
    * subtracted BEFORE the statistics derive, so a deleted doc stops
    * scoring AND stops counting toward N/avgdl/df — identical to a
    * corpus that never held it. */
  def bm25TopK(
      spark: SparkSession, indexDir: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false, maxPostings: Long = 100000L,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    TextRetrieval.bm25TopKFromPostings(
      livePostings(spark, indexDir, beforeBatch),
      queries, qIdCol, qTextCol, k, k1, b, excludeSelf, maxPostings)

  /** BM25 pinned to an AS-OF fence ([[BatchIndex.asOf]] semantics):
    * serve exactly what the store held as of batch `asOfBatch`
    * (`-1` = the seed alone) — the time-travel read for debugging an
    * incremental reprocessing run. All BM25 statistics (tf/df/N/
    * avgdl) derive from the pinned posting rows, so the served
    * ranking is bit-identical to what a query at that point in the
    * stream's history saw. */
  def bm25TopKAsOf(
      spark: SparkSession, indexDir: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, asOfBatch: Long, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false, maxPostings: Long = 100000L): DataFrame =
    bm25TopK(spark, indexDir, queries, qIdCol, qTextCol, k, k1, b,
      excludeSelf, maxPostings,
      beforeBatch =
        if (asOfBatch == Long.MaxValue) asOfBatch else asOfBatch + 1L)

  /** Hybrid more-like-this served ENTIRELY from the store: for each
    * stored doc id in `queryIds`, fuse stored-BM25 and distinct-shared-
    * term overlap by reciprocal rank — and take the query's own term
    * set from its stored postings rows, since neither arm needs more
    * than the query's distinct terms
    * ([[TextRetrieval.queryTerms]]'s observation). Documents are never
    * read and never re-tokenized anywhere in the plan: the store is
    * the only input (the spec asserts the physical plan scans no other
    * path). Self matches are always excluded — a stored query doc
    * trivially retrieves itself at rank 1 on both arms.
    *
    * A query id with no stored postings before the fence contributes
    * no terms and so no result rows (the empty-query contract). */
  def moreLikeThis(
      spark: SparkSession, indexDir: String,
      queryIds: DataFrame, qIdCol: String,
      k: Int, poolK: Int = 20, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      maxPostings: Long = 100000L,
      beforeBatch: Long = Long.MaxValue): DataFrame = {
    // tombstone-masked like bm25TopK: a deleted doc can neither be
    // retrieved nor source query terms
    val tf = livePostings(spark, indexDir, beforeBatch)
    val qTerms = tf
      .join(broadcast(queryIds.select(col(qIdCol).as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("query_id"), col("term"))
    TextRetrieval.hybridRrfFromTerms(tf, qTerms, k, poolK, rrfK,
      excludeSelf = true, k1, b, maxPostings)
  }
}
