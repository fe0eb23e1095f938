package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{TextAnalysis, TextFunctions}

/** The composed LLM-training-data cleaning pipeline — the end-to-end
  * shape the north-star operators exist for, wired from the verified
  * pieces:
  *
  *   1. exact dedup on the canonical fingerprint (16-byte shuffle key);
  *   2. near-dedup: MinHash/LSH candidates, each bucket keeping its
  *      minimal doc id (connected components are overkill for the
  *      keep-one-of-each-pair policy; min-id-per-pair-chain is the
  *      standard first-pass used at corpus scale);
  *   3. language filter on the marker-word classifier;
  *   4. quality-score threshold.
  *
  * Every stage is a DataFrame -> DataFrame transform, so the pipeline
  * scales exactly as its pieces do: fingerprint/minhash shuffles are
  * keyed on doc id or 16-byte hashes, never on document text.
  */
object TrainingDataPipeline {

  case class CleanStats(
      input: Long, afterExact: Long, afterNear: Long, afterLang: Long, afterQuality: Long)

  /** Ids dropped by exact dedup (every doc whose fingerprint has a
    * smaller keeper id). */
  def exactDupIds(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .withColumn("keep_id", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("id") =!= col("keep_id"))
      .select(col("id"))

  /** Ids dropped by near-dedup: for every LSH candidate pair verified by
    * the integer-threshold Jaccard, drop the larger id. Uses the
    * candidates->verify composition ([[Dedup.jaccardOnCandidates]]), the
    * scale path — never the all-pairs [[Dedup.jaccardPairs]]. */
  def nearDupIds(
      docs: DataFrame, idCol: String, textCol: String,
      p: Int = 1, q: Int = 2): DataFrame =
    Dedup.jaccardOnCandidates(docs, idCol, textCol, p, q)
      .select(col("id_b").as("id")).distinct()

  /** Quality-aware near-dedup drop list: verified pairs -> connected
    * components ([[Dedup.jaccardOnCandidates]] ->
    * [[graft.dedup.Clusters.connectedComponents]]) -> keep the
    * highest-quality member of each cluster
    * ([[graft.dedup.Clusters.keepersByScore]]). Unlike [[nearDupIds]]'
    * pairwise larger-id drop, this is transitive-chain-safe (A~B, B~C
    * drops exactly two of the three, never an unpaired doc) and lets
    * quality pick the survivor. Costs the component iteration
    * (rounds = cluster diameter) on top of the pair list — use it for
    * periodic full-corpus passes; [[nearDupIds]] stays the cheap
    * first-pass default. */
  def nearDupIdsByCluster(
      docs: DataFrame, idCol: String, textCol: String,
      p: Int = 1, q: Int = 2): DataFrame = {
    val edges = Dedup.jaccardOnCandidates(docs, idCol, textCol, p, q)
    val cc = graft.dedup.Clusters.connectedComponents(
      docs.select(col(idCol)), idCol, edges)
    val keepers = graft.dedup.Clusters.keepersByScore(
      cc, TextAnalysis.qualityByDoc(docs, idCol, textCol), idCol, "quality")
    cc.join(keepers.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol).as("id"))
  }

  /** Full cleaning pass. Returns the surviving documents.
    *
    * `persistStages` caches each stage's survivor frame
    * (MEMORY_AND_DISK): every stage is referenced by at least two
    * downstream branches (its own filter computation AND the semi/anti
    * join), so without persistence the lineage re-executes upstream
    * stages multiplicatively. This is the standard multi-stage-pipeline
    * trade — at full scale you would persist (or write) each survivor
    * set once rather than recompute the whole prefix per stage. Left
    * off by default so one-shot callers don't hold cache blocks; the
    * caller owns unpersisting (spark.catalog.clearCache()). */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      persistStages: Boolean = false): DataFrame =
    stages(docs, idCol, textCol, keepLangs, minQuality, persistStages).last

  /** The four survivor frames in stage order (after exact dedup, near
    * dedup, language filter, quality threshold) — the single definition
    * both [[clean]] (last frame) and [[stats]] (per-frame counts) use.
    *
    * The language/quality keep-lists are computed from the RAW `docs`,
    * not from the stage-2/3 survivor frames: both are pure per-document
    * predicates, so intersecting them (left-semi) with d2/d3 yields the
    * identical membership — but deriving them from d2/d3 would embed
    * the near-dedup lineage in their subtrees, and without persistence
    * each later stage then re-executes the whole expensive prefix
    * (stage-k cost ~2^k). From raw docs the near-dedup subtree executes
    * once per consumer of d2, not once per downstream stage; the trade
    * is scoring docs that earlier stages already dropped — cheap
    * per-row work vs re-running MinHash/LSH/verify. */
  private def stages(
      docs: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String], minQuality: Double,
      persistStages: Boolean): Seq[DataFrame] = {
    def stage(df: DataFrame): DataFrame =
      if (persistStages) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    val exactDrops = exactDupIds(docs, idCol, textCol)
    val d1 = stage(docs.join(exactDrops, docs(idCol) === exactDrops("id"), "left_anti"))
    val nearDrops = nearDupIds(d1, idCol, textCol)
    val d2 = stage(d1.join(nearDrops, d1(idCol) === nearDrops("id"), "left_anti"))
    val withLang = TextAnalysis.langIdByDoc(docs, idCol, textCol)
      .filter(col("lang_pred").isin(keepLangs: _*))
      .select(col(idCol).as("keep_lang_id"))
    val d3 = stage(d2.join(withLang, d2(idCol) === col("keep_lang_id"), "left_semi"))
    val quality = TextAnalysis.qualityByDoc(docs, idCol, textCol)
      .filter(col("quality") >= minQuality)
      .select(col(idCol).as("keep_q_id"))
    val d4 = d3.join(quality, d3(idCol) === col("keep_q_id"), "left_semi")
    Seq(d1, d2, d3, d4)
  }

  /** The streaming face of the cleaning pipeline, for continuous
    * ingestion: watermarked exact dedup on the canonical fingerprint
    * (first-seen-wins — batch [[clean]] keeps the min id instead, the
    * only semantic difference), then the per-row language and quality
    * filters ([[graft.functions.TextFunctions]] forms — the aggregate
    * twins need a groupBy the streaming path doesn't want). Near-dedup
    * is deliberately absent here: LSH candidate generation needs
    * corpus-wide bucket state, which this watermarked variant does not
    * keep — [[cleanStreamDurable]] is the full-pipeline face that runs
    * it per micro-batch against a durable band index. State here is
    * bounded by the watermark (duplicates are only tracked while they
    * can still arrive). */
  def cleanStream(
      docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermarkDelay: String,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .filter(TextFunctions.langId(col(textCol)).isin(keepLangs: _*))
      .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .drop("fp")

  /** The DURABLE-INDEX streaming face of [[clean]] — continuous
    * ingestion with the full pipeline's semantics, no watermark window:
    * per micro-batch,
    *
    *  1. exact dedup against the durable fingerprint store
    *     (`indexDir/fp`, [[graft.streaming.IncrementalDedup]]'s flow) —
    *     a byte-identical duplicate is dropped months later;
    *  2. near-dedup against the durable LSH band index
    *     (`indexDir/near`, [[graft.streaming.NearDedupStream]]'s flow):
    *     within-batch candidates->verify plus band-join against all
    *     admitted history — the gap [[cleanStream]]'s watermarked
    *     variant leaves to "a periodic batch pass" is closed per batch;
    *  3. the per-row language + quality filters (the same
    *     [[graft.functions.TextFunctions]] forms [[cleanStream]] uses).
    *
    * Index updates record DEDUP-stage survivors, before the filters —
    * matching batch [[clean]], where content is deduped once regardless
    * of whether its representative then survives filtering: a duplicate
    * of a seen-but-filtered document must stay dropped, not re-surface.
    * The fingerprint store records exact-stage survivors (so later
    * exact copies drop at the cheap stage-1 probe); the band index
    * records near-stage survivors (the admitted canonical docs).
    *
    * Zero Structured Streaming state — all history is the two parquet
    * indexes; replay-safe via the shared batch fence (each batch reads
    * strictly earlier partitions and overwrites its own). `emit` must
    * be idempotent per batchId. Ids must be longs, text a string. */
  def cleanStreamDurable(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: String,
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      // the near-dedup LSH/verify parameters, surfaced because they are
      // part of the INDEX's identity, not just this stream's: bands
      // generated under different (shingleN, nHashes, rowsPerBand)
      // never collide with the stored ones, so an index seeded via
      // NearDedupStream.backfillIndex with non-default parameters would
      // silently lose all recall against its seed. Defaults match
      // backfillIndex's.
      p: Int = 1, q: Int = 2, shingleN: Int = 3,
      nHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100000)(
      emit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.streaming.{IncrementalDedup, NearDedupStream}
    docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // 1. exact vs durable fingerprints; materialized — it feeds the
        // fp write AND the near stage's joins
        val afterExact = IncrementalDedup.dedupBatch(
            batch, s"$indexDir/fp", idCol, textCol, beforeBatch = batchId)
          .localCheckpoint()
        // 2. near-dedup vs durable bands (single-tokenize batch core)
        val core = NearDedupStream.dedupBatchWithBands(
          afterExact, s"$indexDir/near", idCol, textCol, batchId,
          p, q, shingleN, nHashes, rowsPerBand, maxBucket)
        val fresh = core.survivors
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // 3. per-row filters — only the emitted rows, never the index
          emit(fresh
            .filter(TextFunctions.langId(col(textCol)).isin(keepLangs: _*))
            .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality),
            batchId)
          afterExact
            .select(TextFunctions.fingerprint(col(textCol)).as("fp"))
            .write.mode("overwrite").parquet(s"$indexDir/fp/batch=$batchId")
          // docs before bands — NearDedupStream's crash-ordering rule
          fresh.select(col(idCol).as("id"), col(textCol).as("text"))
            .write.mode("overwrite").parquet(s"$indexDir/near/docs/batch=$batchId")
          core.bands.join(fresh.select(col(idCol).cast("long").as("id")),
              Seq("id"), "left_semi")
            .write.mode("overwrite").parquet(s"$indexDir/near/bands/batch=$batchId")
          // admission stamps for time-based retention, after all three
          // partition writes (a crash first costs only mtime accuracy)
          Seq(s"$indexDir/fp", s"$indexDir/near/docs", s"$indexDir/near/bands")
            .foreach(graft.streaming.BatchIndex
              .stampBatch(batch.sparkSession, _, batchId))
        } finally {
          fresh.unpersist()
          core.cleanup()
          NearDedupStream.dropLocalCheckpoint(afterExact)
        }
        ()
      }
  }

  /** Per-stage survivor counts (for monitoring/regression). Computes
    * each stage once, reusing the previous stage's frame — no
    * re-execution of the expensive near-dedup inside a second clean()
    * pass. */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      keepLangs: Seq[String] = Seq("en"), minQuality: Double = 0.5,
      persistStages: Boolean = false): CleanStats = {
    val Seq(d1, d2, d3, d4) =
      stages(docs, idCol, textCol, keepLangs, minQuality, persistStages)
    CleanStats(docs.count(), d1.count(), d2.count(), d3.count(), d4.count())
  }
}
