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

  private def tmp(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"), name).getPath

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
        ORDER BY doc_id""")))
}
