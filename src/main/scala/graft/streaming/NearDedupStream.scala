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
  * own (band, bv) set on the build side and inherits AQE skew handling
  * (a degenerate band value is the same hot-bucket concern
  * [[Dedup.lshCandidates]] caps in-batch — cap it at ingest by
  * pre-filtering stop-band values if a corpus develops one). Exact
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
  def readBands(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    BatchIndex.read(spark, s"$indexDir/bands", bandsSchema, beforeBatch)

  /** Admitted (id, text) rows, same fence/seed semantics. */
  def readDocs(
      spark: SparkSession, indexDir: String,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    BatchIndex.read(spark, s"$indexDir/docs", docsSchema, beforeBatch)

  /** Seed the durable index from an already-admitted corpus — the
    * batch-backfill entry a deployment runs ONCE before switching to
    * the stream: band rows and texts land as ROOT-level seed files,
    * which every batch fence reads as oldest history (batch -1). The
    * LSH parameters must match the ones the stream will use — bands
    * generated under different (shingleN, nHashes, rowsPerBand) don't
    * collide correctly and the seed would be silently useless. */
  def backfillIndex(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      shingleN: Int = 3, nHashes: Int = 8, rowsPerBand: Int = 2): Unit = {
    Dedup.bandTable(
        Dedup.minhashSignature(docs, idCol, textCol, nHashes, shingleN),
        idCol, nHashes, rowsPerBand)
      .write.mode("overwrite").parquet(s"$indexDir/bands")
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .write.mode("overwrite").parquet(s"$indexDir/docs")
  }

  /** One micro-batch: survivors of `batch` against the index state as
    * of `beforeBatch` (also the batch-backfill entry point — both
    * paths share this definition). Steps 1-3 of the object doc. */
  def nearDedupBatch(
      batch: DataFrame, indexDir: String, idCol: String, textCol: String,
      beforeBatch: Long = Long.MaxValue,
      p: Int = 1, q: Int = 2, shingleN: Int = 3,
      nHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100000): DataFrame = {
    val spark = batch.sparkSession
    // 1. within-batch: verified pairs come out id_a < id_b, drop id_b.
    // The survivor frame feeds THREE downstream consumers (band
    // generation, the verify doc union, and the final anti-join), and
    // Spark re-executes a lazy subtree per consumer — which here means
    // re-running the whole in-batch LSH+verify pipeline each time.
    // Materialize it once: the frame is batch-sized, and this is a
    // micro-batch/backfill operator, so a local checkpoint (eager, one
    // write) is the right truncation.
    val withinPairs = Dedup.jaccardOnCandidates(
      batch, idCol, textCol, p, q, shingleN, nHashes, rowsPerBand, maxBucket)
    val within = batch.join(
        withinPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .localCheckpoint()
    // 2. cross-batch candidates: (old admitted id, new id) per shared band
    val newBands = Dedup.bandTable(
      Dedup.minhashSignature(within, idCol, textCol, nHashes, shingleN),
      idCol, nHashes, rowsPerBand)
    val oldBands = readBands(spark, indexDir, beforeBatch)
    val cand = newBands.as("nb")
      .join(oldBands.as("ob"), Seq("band", "bv"))
      .select(col("ob.id").as("id_a"), col("nb.id").as("id_b"))
      .distinct()
    // 3. verify on exact shingle sets: old texts fetched ONLY for
    // referenced candidates (semi-join prune), then one jaccardVerify
    // over a frame holding both sides
    val oldDocs = readDocs(spark, indexDir, beforeBatch)
      .join(cand.select(col("id_a").as("id")), Seq("id"), "left_semi")
    val verifyDocs = within.select(col(idCol), col(textCol))
      .unionByName(oldDocs.select(
        col("id").as(idCol), col("text").as(textCol)))
    val dropped = Dedup.jaccardVerify(
        verifyDocs, cand, idCol, textCol, p, q, shingleN)
      .select(col("id_b").as(idCol)).distinct()
    within.join(dropped, Seq(idCol), "left_anti")
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
        val fresh = nearDedupBatch(
          batch, indexDir, idCol, textCol, beforeBatch = batchId,
          p, q, shingleN, nHashes, rowsPerBand, maxBucket)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          emit(fresh, batchId)
          // survivors are persisted, so the band recompute below is one
          // tokenize pass over them, not a re-run of the dedup joins
          Dedup.bandTable(
              Dedup.minhashSignature(fresh, idCol, textCol, nHashes, shingleN),
              idCol, nHashes, rowsPerBand)
            .write.mode("overwrite").parquet(s"$indexDir/bands/batch=$batchId")
          fresh.select(col(idCol).as("id"), col(textCol).as("text"))
            .write.mode("overwrite").parquet(s"$indexDir/docs/batch=$batchId")
        } finally fresh.unpersist()
        ()
      }
}
