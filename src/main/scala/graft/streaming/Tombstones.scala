package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The ONE tombstone sub-store every batch=N-layout delete path
  * shares ([[PostingsStream]]'s doc deletes, [[IncrementalDedup]]'s
  * fingerprint deletes, [[NearDedupStream]]'s doc deletes, and since
  * round 18 [[VectorIndexStream]]'s id deletes — layout, writes, and
  * retirement all run through here; the vector store's RESOLUTION
  * still rides its cells journal's `P` lines instead of the purge
  * fence, because its tombstone drop is committed atomically WITH the
  * store swap — the crash window the fence exists to close never
  * opens there).
  * Tombstoned keys live under `storeDir/_tombstones/batch=N` — the
  * `_` prefix keeps the sub-store invisible to [[BatchIndex.read]]'s
  * listing and stray-directory check AND to Spark partition
  * discovery — with admission stamps, so retention fences and as-of
  * reads compose with the host store's own batches under one shared
  * batch clock (one CDC feed, or coordinated manual ids — the same
  * contract the vector store documents).
  *
  * Two deletion readings, chosen by the host store's id contract:
  * [[liveKeys]] is the TERMINAL set (a tombstone holds until purge —
  * right when re-ingesting a key is forbidden, as for postings doc
  * ids); [[maxBatchPerKey]] + [[maskLatest]] order each tombstone
  * against the row's own batch (a row written AFTER the delete
  * revives — right for upsert/re-admission stores; ties resolve to
  * deleted, a takedown is never lost to a tie).
  */
private[graft] object Tombstones {

  def dirOf(storeDir: String): String = s"$storeDir/_tombstones"

  def exists(spark: SparkSession, storeDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dirOf(storeDir))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Land one batch of deletions (keys already projected to the
    * tombstone schema's columns). Overwrite-idempotent per batch id —
    * the exactly-once posture every appender here uses. */
  def writeBatch(
      spark: SparkSession, storeDir: String, keys: DataFrame,
      batchId: Long): Unit = {
    require(batchId >= 0, s"batchId must be non-negative, got $batchId")
    // a tombstone landing during a purge's stage-and-swap would be
    // dropped with the store it arrived too late to mask — refuse and
    // let the delete stream replay after the lease clears
    MaintenanceLease.refuseIfHeld(
      spark, storeDir, s"write tombstone batch=$batchId")
    keys.distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"${dirOf(storeDir)}/batch=$batchId")
    BatchIndex.stampBatch(spark, dirOf(storeDir), batchId)
  }

  /** Tombstone rows admitted strictly before `beforeBatch`, with
    * their `batch` column; empty (with schema) when the store has
    * never seen a delete. */
  def read(
      spark: SparkSession, storeDir: String, keySchema: StructType,
      beforeBatch: Long = Long.MaxValue): DataFrame =
    BatchIndex.read(spark, dirOf(storeDir), keySchema, beforeBatch)

  /** True iff the tombstone sub-store holds at least one `batch=N`
    * partition. A bare directory-exists check is NOT enough for the
    * schema-inferring readers: a crashed purge recovered through the
    * journal's per-batch `P` lines leaves `_tombstones/` holding only
    * the `_batch_ts` stamp dir, and a parquet read of a data-less
    * directory crashes on schema inference instead of reading as "no
    * deletes". */
  private def hasBatches(spark: SparkSession, storeDir: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(dirOf(storeDir))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(root) && fs.listStatus(root).exists(e =>
      e.isDirectory && e.getPath.getName.startsWith("batch="))
  }

  /** Schema-INFERRING read for stores whose key type is data-defined
    * (the vector store's id column may be long or string — the stored
    * parquet is authoritative): None when the store has never seen a
    * delete OR holds no tombstone batches (a recovered crash's
    * stamps-only debris — see [[hasBatches]]; callers keep delete-free
    * serves on their original plan either way), otherwise every
    * tombstone row under the optional fence. Same fence semantics as
    * [[read]]. */
  def readInferred(
      spark: SparkSession, storeDir: String,
      beforeBatch: Option[Long] = None): Option[DataFrame] =
    if (!hasBatches(spark, storeDir)) None
    else {
      val all = spark.read.option("basePath", dirOf(storeDir))
        .parquet(dirOf(storeDir))
      Some(beforeBatch.fold(all)(b => all.filter(col("batch") < b)))
    }

  /** The TERMINAL tombstoned-key set (distinct, fenced). `afterBatch`
    * drops batches at or below a purge fence ([[readFence]]) — those
    * were already physically resolved by a completed rewrite, the same
    * exclusion [[maxBatchPerKey]] applies for masked reads. */
  def liveKeys(
      spark: SparkSession, storeDir: String, keySchema: StructType,
      beforeBatch: Long = Long.MaxValue,
      afterBatch: Long = Long.MinValue): DataFrame =
    read(spark, storeDir, keySchema, beforeBatch)
      .filter(col("batch") > afterBatch)
      .select(keySchema.fieldNames.map(col).toIndexedSeq: _*).distinct()

  /** Per-key MAX delete batch (fenced) — the batch-ordered face.
    * `afterBatch` drops tombstone batches at or below a PURGE FENCE
    * ([[readFence]]): those were already physically resolved by a
    * completed rewrite, and re-applying them would re-kill rows the
    * purge deliberately kept (re-admissions after the delete, re-dated
    * to seed batch -1 by the rewrite). */
  def maxBatchPerKey(
      spark: SparkSession, storeDir: String, keySchema: StructType,
      beforeBatch: Long = Long.MaxValue,
      afterBatch: Long = Long.MinValue): DataFrame =
    read(spark, storeDir, keySchema, beforeBatch)
      .filter(col("batch") > afterBatch)
      .groupBy(keySchema.fieldNames.map(col).toIndexedSeq: _*)
      .agg(max(col("batch")).as("del_batch"))

  /** The newest tombstone batch id present (unfenced) — what a purge
    * records as its fence value; None when the store holds no rows. */
  def maxTombstoneBatch(
      spark: SparkSession, storeDir: String,
      keySchema: StructType): Option[Long] =
    read(spark, storeDir, keySchema)
      .agg(max(col("batch"))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))

  // ---- purge fence: a file the purge's journal writes ATOMICALLY with
  // the store rewrite (BatchIndex.rewriteAll extraJournal -> an
  // `F _purge_fence N` line), recording the newest tombstone batch the
  // rewrite resolved. It closes the crash window between a completed
  // swap and the tombstone-store drop: without it, the rewrite's
  // re-dating (survivors -> seed batch -1) would flip keys re-admitted
  // AFTER their delete back below the still-on-disk tombstones — masked
  // reads would serve them dead, and a purge RE-RUN (the documented
  // recovery) would permanently destroy them. With the fence, masked
  // reads and re-runs skip tombstone batches <= fence. The fence lives
  // in the REWRITTEN store's dir (per-store: the near-dedup pair fences
  // docs and bands independently, so a crash between the two rewrites
  // leaves each store reading exactly its own resolution state). Batch
  // ids must stay monotone across a purge (the shared-clock contract) —
  // a delete batch re-landed UNDER a dropped fence's value after the
  // fence was cleared is the one flow this cannot see, and single-writer
  // maintenance excludes it.

  private val FenceName = "_purge_fence"

  /** The journal line that commits fence value `through` with the swap. */
  def fenceLine(through: Long): String = s"F $FenceName $through"

  /** The store's purge fence, if a completed purge swap left one. */
  def readFence(spark: SparkSession, storeDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(storeDir, FenceName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      text.toLongOption.orElse(throw new IllegalStateException(
        s"purge fence $p holds non-numeric content '$text' — refusing to " +
          "guess which tombstones a crashed purge already resolved"))
    }
  }

  /** Remove a store's purge fence (the final step of a completed purge,
    * after the tombstone store is dropped). */
  def dropFence(spark: SparkSession, storeDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(storeDir, FenceName)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    ()
  }

  /** Batch-ordered subtraction: keep a store row iff it was never
    * tombstoned OR it was written AFTER its key's newest delete
    * (`batch > del_batch`; the seed's batch -1 is below any delete,
    * so deleted seed rows stay dead until re-written). `rows` must
    * carry the store's `batch` column; the tombstone side is
    * broadcast (small by contract: purge folds it away). */
  def maskLatest(
      rows: DataFrame, deadMaxBatch: DataFrame, keyCols: Seq[String]): DataFrame =
    rows.join(broadcast(deadMaxBatch), keyCols, "left")
      .filter(col("del_batch").isNull || col("batch") > col("del_batch"))
      .drop("del_batch")

  /** Remove the tombstone sub-store (the last step of a completed
    * purge: every kept tombstone is either executed or superseded). */
  def drop(spark: SparkSession, storeDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dirOf(storeDir))
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    ()
  }

  /** Drop only the tombstone batches a completed purge RESOLVED
    * (`batch <= through`) — never the whole store: a takedown batch
    * that landed after the purge read its set (a crashed purge's
    * journal awaiting replay, an expired-lease window) must survive
    * unresolved rather than be silently destroyed. Returns true when
    * LATER batches remain — the caller then KEEPS its purge fence
    * (masked reads skip the resolved batches, apply the later ones —
    * conservatively: against re-dated rows a kept tombstone re-kills a
    * same-key re-admission, and takedowns win ties by design; the
    * next purge resolves them for real) — and drops the now-empty
    * store (stamps included) otherwise. */
  def dropThrough(
      spark: SparkSession, storeDir: String, through: Long): Boolean = {
    val root = new org.apache.hadoop.fs.Path(dirOf(storeDir))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return false
    fs.listStatus(root).foreach { e =>
      if (e.isDirectory && e.getPath.getName.startsWith("batch=") &&
          e.getPath.getName.stripPrefix("batch=").toLongOption
            .exists(_ <= through))
        fs.delete(e.getPath, true)
    }
    val remaining = fs.listStatus(root).exists(e =>
      e.isDirectory && e.getPath.getName.startsWith("batch="))
    if (!remaining) fs.delete(root, true)
    else BatchIndex.pruneStamps(spark, root.toString)
    remaining
  }
}
