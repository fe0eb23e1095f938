package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
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
  * `dedupBatch` when the index outgrows the batch by enough that
  * pruning its scan matters.
  *
  * Exactly-once: foreachBatch re-runs a failed batch under the same
  * batchId. A re-run may re-append fingerprints the failed attempt
  * already wrote — harmless by construction, because the index is a
  * SET under anti-join semantics (duplicate fp rows change no
  * membership decision and the window reads only `fp`). Downstream
  * `emit` receives the same survivor rows and must be idempotent per
  * batchId, the standard foreachBatch contract.
  */
object IncrementalDedup {

  private val indexSchema = StructType(Seq(StructField("fp", StringType)))

  /** The accumulated fingerprint index, or an empty frame on the very
    * first batch (missing directory). */
  def readIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String): DataFrame =
    try spark.read.schema(indexSchema).parquet(indexDir)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      spark.createDataFrame(new java.util.ArrayList[Row](), indexSchema)
    }

  /** One micro-batch: survivors of the batch against the index (also
    * exposed for batch backfills so both paths share one definition). */
  def dedupBatch(
      batch: DataFrame, indexDir: String, idCol: String, textCol: String): DataFrame =
    Dedup.dedupAgainstIndex(
      batch, readIndex(batch.sparkSession, indexDir), idCol, textCol)

  /** Streaming writer: `emit` sees each batch's surviving documents,
    * then their fingerprints are appended to `indexDir`. Start with
    * `.start()`; outputMode is Update (per-batch deltas, no global
    * result table). */
  def dedupStreamToIndex(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, checkpointDir: String)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fresh = dedupBatch(batch, indexDir, idCol, textCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          emit(fresh, batchId)
          fresh.select(TextFunctions.fingerprint(col(textCol)).as("fp"))
            .write.mode("append").parquet(indexDir)
        } finally fresh.unpersist()
        ()
      }
}
