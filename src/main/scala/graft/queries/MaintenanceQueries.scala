package graft.queries

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables
import graft.streaming.BatchIndex

/** Store-lifecycle verbs through the oracle gate (SURVEY.md §2.8's
  * durable-store maintenance: retention, compaction, fsck). The other
  * streamed-store queries verify what the stores ANSWER; these verify
  * what the stores KEEP — the deletion/classification semantics that
  * bound a 100 TB deployment's history and heal its crashes. Each run
  * rebuilds its store from `documents` with deterministic batch splits
  * and deterministic admission stamps, so the surviving rows are a pure
  * function of the base table and DuckDB can recompute them.
  */
object MaintenanceQueries {

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def tmp(name: String): String = QueryScratch.dir(name)

  private val docIdSchema = StructType(Seq(StructField("doc_id", LongType)))

  /** Write `documents` ids into `batch=N` partitions of a BatchIndex
    * store, batch = doc_id mod `nBatches`, stamped at `baseMillis + N s`
    * (explicit stamps — wall-clock-free, so the oracle is stable). */
  private def buildStore(
      spark: SparkSession, dir: String, sfDir: String, nBatches: Int,
      baseMillis: Long): Unit = {
    deleteDir(spark, dir)
    val docs = Tables.table(spark, sfDir, "documents").select(col("doc_id"))
    (0 until nBatches).foreach { b =>
      docs.filter(col("doc_id") % nBatches === b)
        .write.mode("overwrite").parquet(s"$dir/batch=$b")
      BatchIndex.stampBatch(spark, dir, b.toLong, baseMillis + b * 1000L)
    }
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q111_store_retention",
      "Durable-store retention end-to-end (BatchIndex: compact + " +
        "expireOlderThan): documents ids land as five stamped batches " +
        "(batch = doc_id mod 5, admitted at base+N s), batch 0 is " +
        "COMPACTED into root-level seed files (read back as batch -1, " +
        "journal-protected rewrite), then a wall-clock cutoff at " +
        "base+3 s expires history admitted before it — the cutoff " +
        "resolves to keep-from-batch-3 via the admission stamps, " +
        "deleting batches 1 and 2 while the seed (oldest history, " +
        "dropSeed-gated) and batches 3-4 survive. Output is every " +
        "surviving id with its batch lineage. At 100 TB this pair is " +
        "what bounds a forever-appending store: compaction bounds the " +
        "directory listing, expiry bounds the history itself.",
      (spark, dir) => {
        val store = tmp("graft_q111_store")
        val base = 1700000000000L
        buildStore(spark, store, dir, nBatches = 5, baseMillis = base)
        BatchIndex.compact(spark, store, docIdSchema, throughBatch = 0L)
        BatchIndex.expireOlderThan(spark, store, cutoffMillis = base + 3000L)
        BatchIndex.read(spark, store, docIdSchema)
          .select(col("doc_id"), col("batch"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN CAST(-1 AS BIGINT)
                    ELSE doc_id % 5 END AS batch
        FROM documents
        WHERE doc_id % 5 IN (0, 3, 4)
        ORDER BY doc_id""")),

    GraftQuery(
      "q112_store_fsck",
      "Store fsck + quarantine (BatchIndex.verifyStore / " +
        "quarantineOrphans): documents ids land as four batches " +
        "(doc_id mod 4) against a synthesized stream checkpoint whose " +
        "offsets log started batches 0-2 and whose commits log sealed " +
        "0-1 — so fsck classifies 0-1 committed (durable), 2 pending " +
        "(the stream's own replay corrects it; left alone), 3 orphan " +
        "(no replay will ever overwrite it; renamed into _quarantine, " +
        "never deleted). Output is every still-admitted id with its " +
        "batch's classification; the quarantined batch's ids are gone " +
        "from history everywhere (read, fences, partition discovery) " +
        "but recoverable on disk.",
      (spark, dir) => {
        val store = tmp("graft_q112_store")
        val ckpt = tmp("graft_q112_ckpt")
        buildStore(spark, store, dir, nBatches = 4, baseMillis = 1700000000000L)
        deleteDir(spark, ckpt)
        val fs = new Path(ckpt).getFileSystem(spark.sessionState.newHadoopConf())
        Seq("offsets" -> Seq(0L, 1L, 2L), "commits" -> Seq(0L, 1L)).foreach {
          case (log, ids) => ids.foreach { id =>
            fs.create(new Path(s"$ckpt/$log/$id"), true).close()
          }
        }
        val moved = BatchIndex.quarantineOrphans(spark, store, ckpt)
        require(moved == Seq(3L), s"expected orphan batch 3 moved, got $moved")
        val check = BatchIndex.verifyStore(spark, store, ckpt)
        require(check.orphans.isEmpty,
          s"orphans remain after quarantine: ${check.orphans}")
        import spark.implicits._
        val status = (check.committed.map(_ -> "committed") ++
          check.pending.map(_ -> "pending")).toDF("batch", "status")
        BatchIndex.read(spark, store, docIdSchema)
          .join(broadcast(status), "batch")
          .select(col("doc_id"), col("batch"), col("status"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, doc_id % 4 AS batch,
               CASE WHEN doc_id % 4 <= 1 THEN 'committed'
                    ELSE 'pending' END AS status
        FROM documents
        WHERE doc_id % 4 <= 2
        ORDER BY doc_id""")),

    GraftQuery(
      "q116_store_crash_recovery",
      "Compaction crash recovery end-to-end (BatchIndex's journal " +
        "protocol): documents ids land as three batches, then a " +
        "compaction of batch 0 is frozen AT its commit point — staged " +
        "seed rows under _compact_tmp plus a committed journal naming " +
        "the deletion and promotions, exactly the on-disk state a " +
        "crash right after the journal write leaves. While the " +
        "journal exists every read fails loudly (verified in-query: a " +
        "partial state could silently double or drop history); the " +
        "next compact() replays the journal idempotently — batch 0 " +
        "deleted, staged files promoted to root seeds — and the store " +
        "reads back complete with batch 0's rows as seed history. " +
        "Nothing is lost, nothing is doubled: the oracle is every " +
        "document with its post-recovery lineage.",
      (spark, dir) => {
        val store = tmp("graft_q116_store")
        buildStore(spark, store, dir, nBatches = 3, baseMillis = 1700000000000L)
        val fs = new Path(store).getFileSystem(spark.sessionState.newHadoopConf())
        // stage batch 0's rows as the crashed compaction would have
        val tmpDir = new Path(store, "_compact_tmp")
        Tables.table(spark, dir, "documents").select(col("doc_id"))
          .filter(col("doc_id") % 3 === 0)
          .write.mode("overwrite").parquet(tmpDir.toString)
        val staged = fs.listStatus(tmpDir)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.getName)
        // commit point: the journal names every pending mutation
        val journal = ("D batch=0" +: staged.toSeq.map(f => s"M $f seed-rec-$f"))
          .mkString("", "\n", "\n")
        val out = fs.create(new Path(store, "_compact_journal"), true)
        try out.write(journal.getBytes("UTF-8")) finally out.close()
        // mid-rewrite state must refuse reads instead of serving it
        val refused =
          try { BatchIndex.read(spark, store, docIdSchema).count(); false }
          catch { case _: IllegalStateException => true }
        require(refused, "read served a store holding a compaction journal")
        // recovery: the next compact replays the journal first
        BatchIndex.compact(spark, store, docIdSchema, throughBatch = 0L)
        BatchIndex.read(spark, store, docIdSchema)
          .select(col("doc_id"), col("batch"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN CAST(-1 AS BIGINT)
                    ELSE doc_id % 3 END AS batch
        FROM documents
        ORDER BY doc_id""")))
}
