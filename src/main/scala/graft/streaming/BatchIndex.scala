package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** [[BatchIndex.verifyStore]]'s report: every numbered `batch=N`
  * partition of a store classified against the writing stream's
  * checkpoint. `committed` partitions are durable history; `pending`
  * ones belong to a batch the checkpoint STARTED (offsets written) but
  * never committed — the stream replays and overwrites them on resume,
  * so they are healthy unless the stream is abandoned; `orphans` are
  * unknown to the checkpoint entirely (a crashed append whose
  * checkpoint was reset, a stray manual write) — no replay will ever
  * correct them, yet every later fence admits them as history. */
final case class StoreCheck(
    committed: Seq[Long], pending: Seq[Long], orphans: Seq[Long])

/** Shared reader + maintenance ops for the durable per-batch index
  * layout the streaming dedup operators maintain: `dir/batch=N`
  * partition directories plus optional ROOT-level seed files (a batch
  * backfill written without a partition). Root files and partition dirs
  * are listed and read as two frames unioned — NOT one
  * partition-discovery read, which would reject the mixed layout with
  * "Conflicting directory structures detected" and halt the stream
  * after its first written batch. The listing is one driver-side
  * directory scan (O(#batches) entries).
  *
  * Seed rows read as batch -1 (oldest history — visible to every batch
  * fence). Any read failure beyond a missing root propagates: silently
  * treating a corrupt index as empty would void the durable-dedup
  * guarantee and re-emit months of duplicates.
  *
  * A stream appending one `batch=N` directory per micro-batch forever
  * is the classic small-file/listing scale-killer (months of 5-minute
  * batches = ~100k directories listed per batch). [[compact]] folds
  * partitions `<= throughBatch` into root-level seed files — the
  * layout's existing batch -1 semantics — bounding the directory count
  * without changing what any later fence reads; [[expire]] deletes
  * history older than a retention cutoff for deployments that only
  * need bounded-window dedup.
  */
private[graft] object BatchIndex {

  /** Compaction journal file. While it exists the index is mid-rewrite
    * (or a compaction crashed): reads fail loudly — a partial state
    * could silently double or drop history — and re-running [[compact]]
    * completes the pending rewrite first (the journal lists exactly
    * which entries to delete and which staged files to promote, so
    * recovery is idempotent). */
  private[streaming] val Marker = "_compact_journal"
  private val MarkerTmp = "_compact_journal.tmp"
  private val TmpDir = "_compact_tmp"

  /** Commit the journal ATOMICALLY: write the full line list to a temp
    * name, then rename into place. A direct create+write could crash
    * mid-flush and leave a TRUNCATED journal — and since the `D` lines
    * serialize first, a journal cut between the deletes and the `M`
    * promotions would make recovery destroy the store's old entries
    * without ever promoting the staged replacement (rewriteAll's `D`
    * lines name EVERY seed file and batch partition, so the loss would
    * be total). The rename is the commit point; [[finishCompact]]
    * additionally refuses a journal missing its trailing newline
    * terminator (belt-and-braces against a torn manual copy). */
  private def commitJournal(
      fs: FileSystem, root: Path, lines: Seq[String]): Unit = {
    val tmp = new Path(root, MarkerTmp)
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val marker = new Path(root, Marker)
    if (fs.exists(marker)) throw new IllegalStateException(
      s"journal commit: $marker already exists — two maintenance calls " +
        "are racing on this store (single-writer contract violated)")
    if (!fs.rename(tmp, marker)) throw new IllegalStateException(
      s"journal commit: rename $tmp -> $marker failed — store left " +
        "unmodified; re-run the maintenance call")
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Every history-mutating op runs under the store's single-writer
    * [[MaintenanceLease]]: acquired-and-released here when the caller
    * holds none, verified-only when a composite op (a purge spanning
    * rewrite + tombstone drop, or two sub-stores) passes the holder it
    * already acquired. The body receives the holder name so it can
    * RENEW at its commit point ([[renewOrAbort]]) — a staging phase
    * that outran the TTL must abort loudly instead of swapping under
    * a lease a rival already stole. */
  private def withLease[T](spark: SparkSession, dir: String,
      heldBy: Option[String])(body: String => T): T =
    heldBy match {
      case Some(h) =>
        MaintenanceLease.verifyHeld(spark, dir, h); body(h)
      case None =>
        val l = MaintenanceLease.acquire(spark, dir,
          s"maintenance-${java.util.UUID.randomUUID().toString.take(8)}")
        try body(l.holder) finally MaintenanceLease.release(spark, l)
    }

  /** Re-acquire (extend) `holder`'s lease just before a journal
    * commit: the staging write is the unbounded phase (at 100 TB it
    * can outrun any fixed TTL), and if the lease expired mid-staging a
    * rival may already be rewriting — in which case this throws and
    * the swap never happens, leaving only the rival's consistent
    * rewrite instead of two interleaved ones. */
  private def renewOrAbort(
      spark: SparkSession, dir: String, holder: String): Unit = {
    MaintenanceLease.acquire(spark, dir, holder)
    ()
  }

  private def batchOf(name: String): Option[Long] =
    if (name.startsWith("batch=")) name.drop("batch=".length).toLongOption
    else None

  /** Rows of `dir` written by batches strictly before `beforeBatch`
    * (all when omitted); columns = `dataSchema` + `batch` long. Empty
    * on a missing directory (the very first batch). */
  def read(
      spark: SparkSession, dir: String, dataSchema: StructType,
      beforeBatch: Long = Long.MaxValue): DataFrame = {
    val full = StructType(dataSchema.fields :+ StructField("batch", LongType))
    val empty = spark.createDataFrame(new java.util.ArrayList[Row](), full)
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) empty
    else {
      if (fs.exists(new Path(root, Marker))) throw new IllegalStateException(
        s"index dir $dir holds a compaction journal ($Marker) — a compaction " +
          "is in progress or crashed mid-rewrite; re-run compact() on this " +
          "store to complete it before reading")
      val entries = fs.listStatus(root)
      val batchDirs = entries.filter(e =>
        e.isDirectory && e.getPath.getName.startsWith("batch="))
      val seedFiles = entries.filter(e =>
        e.isFile && e.getPath.getName.endsWith(".parquet"))
      // an unrecognized DIRECTORY would be silently skipped as history —
      // e.g. a seed written into a nested subdir instead of root files.
      // That is exactly the quiet data loss this reader must never
      // allow, so name it and fail instead (metadata dirs excepted).
      val strays = entries.filter(e => e.isDirectory &&
        !e.getPath.getName.startsWith("batch=") &&
        !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
      if (strays.nonEmpty) throw new IllegalStateException(
        s"index dir $dir contains non-batch subdirectories " +
          strays.map(_.getPath.getName).mkString("[", ", ", "]") +
          " — seed rows must be root-level parquet files or batch=N partitions")
      val parts =
        (if (batchDirs.isEmpty) Nil
         else Seq(spark.read.option("basePath", dir).schema(full)
           .parquet(batchDirs.map(_.getPath.toString).toIndexedSeq: _*))) ++
        (if (seedFiles.isEmpty) Nil
         else Seq(spark.read.schema(dataSchema)
           .parquet(seedFiles.map(_.getPath.toString).toIndexedSeq: _*)
           .withColumn("batch", lit(-1L))))
      parts.reduceOption(_.unionByName(_)).getOrElse(empty)
        .filter(coalesce(col("batch"), lit(-1L)) < beforeBatch)
    }
  }

  /** AS-OF read (time travel): the store's state as of batch `batch`
    * — every row admitted by batches `<= batch`, root seeds included
    * (`asOf(-1)` is the seed alone). This is the read every
    * incremental-reprocessing debug session wants: "what did the
    * store serve when batch N+1 ran?" is `asOf(N)`, byte-identical to
    * the fence that batch actually read. Exactness bound: [[compact]]
    * folds old partitions into seed rows (batch -1), which every
    * fence admits — so a pinned read is exact only for fences at or
    * above the last compaction's `throughBatch`; keep compaction
    * below any fence still being debugged. Works for ANY store on
    * this layout — the per-store readers (postings, fingerprints,
    * near-dup bands/docs) are this call with their schema. */
  def asOf(
      spark: SparkSession, dir: String, dataSchema: StructType,
      batch: Long): DataFrame =
    read(spark, dir, dataSchema,
      beforeBatch = if (batch == Long.MaxValue) batch else batch + 1L)

  /** Fold `batch=N` partitions with `N <= throughBatch` (plus any
    * existing seed files) into root-level seed files. Read-equivalent
    * for every fence a future batch can present: folded rows move from
    * batch N to batch -1, and any future fence `B > throughBatch`
    * admits both. The NEWEST partition must stay unfolded —
    * `throughBatch` is required to be strictly below the max batch id
    * present — because a crashed stream replays its last batch under
    * the same id with fence `beforeBatch = maxBatch`: folding
    * `batch=maxBatch` into seeds (batch -1) would put the replayed
    * batch's own output behind its fence and it would dedup against
    * itself, silently emitting nothing.
    *
    * Crash-safe via a journal: rows are staged under `_compact_tmp`
    * (invisible to [[read]]), then a `_compact_journal` file naming
    * every deletion and promotion is committed, then deletions and
    * promotions execute and the journal is removed. A crash before the
    * journal leaves the index untouched; a crash after it makes reads
    * fail loudly until the next [[compact]] call replays the journal
    * (each step is idempotent). Requires the writing stream to be
    * stopped or between batches for this store — same single-writer
    * assumption as backfill. */
  def compact(
      spark: SparkSession, dir: String, dataSchema: StructType,
      throughBatch: Long, heldBy: Option[String] = None): Unit = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    withLease(spark, dir, heldBy) { holder =>
    val marker = new Path(root, Marker)
    if (fs.exists(marker)) finishCompact(fs, root, marker)

    val entries = fs.listStatus(root)
    val allBatches = entries.flatMap(e =>
      if (e.isDirectory) batchOf(e.getPath.getName) else None)
    if (allBatches.isEmpty) return // seed-only (or empty) store: already compact
    val maxBatch = allBatches.max
    require(throughBatch < maxBatch,
      s"compact(throughBatch=$throughBatch) on $dir would fold the newest " +
        s"partition batch=$maxBatch into seed rows; a crashed stream replaying " +
        s"batch $maxBatch would then dedup against its own output and emit " +
        s"nothing — compact through at most ${maxBatch - 1}")
    val foldDirs = entries.filter(e => e.isDirectory &&
      batchOf(e.getPath.getName).exists(_ <= throughBatch))
    if (foldDirs.isEmpty) return // nothing at or below the cutoff
    val seedFiles = entries.filter(e =>
      e.isFile && e.getPath.getName.endsWith(".parquet"))

    // stage the folded rows (marker not yet written, so read() works)
    val tmp = new Path(root, TmpDir)
    read(spark, dir, dataSchema, beforeBatch = throughBatch + 1)
      .drop("batch")
      .write.mode("overwrite").parquet(tmp.toString)
    val staged = fs.listStatus(tmp).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val moves = staged.map(f =>
      f.getPath.getName -> s"seed-$nonce-${f.getPath.getName}")
    val deletes = (seedFiles.map(_.getPath.getName) ++
      foldDirs.map(_.getPath.getName)).toSeq

    // commit point: the journal names every mutation; spark part-file
    // and batch=N names never contain spaces, so a line format is safe
    renewOrAbort(spark, dir, holder)
    commitJournal(fs, root,
      deletes.map(d => s"D $d") ++ moves.map { case (t, d) => s"M $t $d" })
    finishCompact(fs, root, marker)
    pruneStamps(spark, dir)
    }
  }

  /** Rewrite the ENTIRE store — seed files AND every batch partition,
    * the newest included — into fresh root seed files holding
    * `transform(allRows)`: the physical-delete primitive
    * ([[graft.streaming.PostingsStream.purgeTombstones]] passes the
    * tombstone anti-join). Collapses batch fences BY DESIGN — physical
    * deletion must destroy fenced history too, so this is the posture
    * of the vector store's purge, not of [[compact]] (whose
    * newest-batch rule exists to keep fences exact; a purged store's
    * as-of reads see only the purged seed). `transform` receives the
    * rows WITH their `batch` column and its result is projected back
    * to `dataSchema`'s columns. Crash-safe via the SAME staging+
    * journal protocol as [[compact]]: stage to `_compact_tmp`
    * (invisible to [[read]]), commit the journal naming every delete
    * and promotion, execute, clear — a crash before the journal
    * leaves the store untouched, one after it is completed by the
    * next maintenance call, and reads refuse loudly in between.
    * Requires the writing stream stopped or between batches.
    *
    * `extraJournal` appends caller-supplied journal lines (executed by
    * [[finishCompact]] AFTER the promotions) — the purge paths pass an
    * `F _purge_fence N` line so the fence that marks their tombstones
    * as physically resolved lands atomically with the swap: once the
    * journal is committed, either the crash happens before recovery
    * (reads refuse) or the fence exists alongside the rewritten rows —
    * there is no window where re-dated rows are visible without the
    * fence that stops the tombstones re-killing them. */
  private[graft] def rewriteAll(
      spark: SparkSession, dir: String, dataSchema: StructType,
      extraJournal: Seq[String] = Nil, heldBy: Option[String] = None)(
      transform: DataFrame => DataFrame): Unit = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    withLease(spark, dir, heldBy) { holder =>
    val marker = new Path(root, Marker)
    if (fs.exists(marker)) finishCompact(fs, root, marker)
    val entries = fs.listStatus(root)
    val batchDirs = entries.filter(e =>
      e.isDirectory && e.getPath.getName.startsWith("batch="))
    val seedFiles = entries.filter(e =>
      e.isFile && e.getPath.getName.endsWith(".parquet"))
    if (batchDirs.isEmpty && seedFiles.isEmpty) return
    val tmp = new Path(root, TmpDir)
    transform(read(spark, dir, dataSchema))
      .select(dataSchema.fieldNames.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(tmp.toString)
    val staged = fs.listStatus(tmp).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val moves = staged.map(f =>
      f.getPath.getName -> s"seed-$nonce-${f.getPath.getName}")
    val deletes = (seedFiles.map(_.getPath.getName) ++
      batchDirs.map(_.getPath.getName)).toSeq
    renewOrAbort(spark, dir, holder)
    commitJournal(fs, root,
      deletes.map(d => s"D $d") ++
        moves.map { case (t, d) => s"M $t $d" } ++ extraJournal)
    finishCompact(fs, root, marker)
    pruneStamps(spark, dir)
    }
  }

  /** Replay the journal: delete superseded entries, promote staged
    * files, write fence files, clear the journal. Every step tolerates
    * having already happened, so crashed compactions complete on the
    * next call. Refuses a journal missing its trailing newline — the
    * committed format always ends with one ([[commitJournal]]), so its
    * absence means the file was torn (a manual copy, a filesystem that
    * ignored the rename contract) and replaying a PREFIX of the
    * mutation list could delete history whose promotion line was cut. */
  private def finishCompact(fs: FileSystem, root: Path, marker: Path): Unit = {
    val in = fs.open(marker)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    if (!text.endsWith("\n")) throw new IllegalStateException(
      s"compaction journal $marker lacks its trailing newline terminator — " +
        "the file is torn (committed journals always end with one); a " +
        "prefix replay could delete entries whose promotion line was cut. " +
        "Inspect the journal and the _compact_tmp staging dir by hand.")
    val tmp = new Path(root, TmpDir)
    text.split("\n").foreach { line =>
      line.split(" ") match {
        case Array("D", name) =>
          val p = new Path(root, name)
          if (fs.exists(p)) fs.delete(p, true)
        case Array("M", from, to) =>
          val src = new Path(tmp, from)
          val dst = new Path(root, to)
          if (fs.exists(src) && !fs.exists(dst)) fs.rename(src, dst)
          else if (fs.exists(src)) fs.delete(src, false) // promoted already
        case Array("F", name, value) => // fence: idempotent overwrite
          val out = fs.create(new Path(root, name), true)
          try out.write(value.getBytes("UTF-8")) finally out.close()
        case _ => // blank line
      }
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    fs.delete(marker, false)
    // a leftover journal TEMP file is pre-commit debris from a crashed
    // attempt (the rename never happened); it must not linger to confuse
    // a later inspection
    val markerTmp = new Path(root, MarkerTmp)
    if (fs.exists(markerTmp)) fs.delete(markerTmp, false)
  }

  /** Per-batch admission-time metadata: `dir/_batch_ts/<batchId>` text
    * files holding epoch millis, written by every store's append path
    * right after the batch partition lands. The `_` prefix keeps the
    * stamp dir invisible to [[read]]'s listing and stray check. Stamps
    * exist so [[expireOlderThan]] can translate a wall-clock retention
    * cutoff into the batch-id fence [[expire]] speaks — deployments
    * think in time, the layout thinks in batch ids. Overwrite-safe: a
    * replayed batch re-stamps itself, which re-ADMITS it for retention
    * purposes (replay is re-processing; its output is new history). */
  private val StampDir = "_batch_ts"

  /** Record when `batchId`'s partition was admitted. Idempotent
    * (overwrites); failure-tolerant by design — a missing stamp falls
    * back to the partition directory's filesystem modification time in
    * [[batchAdmissionTimes]], so a crash between the partition write
    * and the stamp costs accuracy, never correctness. */
  def stampBatch(
      spark: SparkSession, dir: String, batchId: Long,
      atMillis: Long = System.currentTimeMillis()): Unit = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    val d = new Path(root, StampDir)
    fs.mkdirs(d)
    val out = fs.create(new Path(d, batchId.toString), true)
    try out.write(atMillis.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Admission time of every `batch=N` partition present: the stamp
    * file when one exists, else the partition directory's filesystem
    * modification time (pre-stamp stores, crashed stamp writes — both
    * degrade to the FS's own record of when the write happened, which
    * a replay or a filesystem-level copy refreshes). */
  def batchAdmissionTimes(
      spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return Nil
    val stampRoot = new Path(root, StampDir)
    val stamps: Map[Long, Long] =
      if (!fs.exists(stampRoot)) Map.empty
      else fs.listStatus(stampRoot).toSeq.flatMap { s =>
        s.getPath.getName.toLongOption.flatMap { b =>
          val in = fs.open(s.getPath)
          val text =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          text.toLongOption.map(b -> _) // torn stamp -> mtime fallback
        }
      }.toMap
    fs.listStatus(root).toSeq.flatMap { e =>
      if (e.isDirectory)
        batchOf(e.getPath.getName)
          .map(b => b -> stamps.getOrElse(b, e.getModificationTime))
      else None
    }
  }

  /** The batch-id fence equivalent to "keep history admitted at or
    * after `cutoffMillis`": the smallest batch id stamped at/after the
    * cutoff — capped at the NEWEST batch id, so a cutoff in the future
    * degrades to keep-newest-only instead of emptying the store (the
    * same never-empty posture as compact's newest-batch rule). None
    * when the store has no numbered batches (nothing to resolve;
    * seed-only stores expire via `dropSeed` explicitly). Assumes
    * admission times are non-decreasing in batch id, which streaming
    * admission guarantees; a manually back-stamped batch makes the min
    * rule conservative (keeps more), never lossy. */
  def keepFromForCutoff(
      spark: SparkSession, dir: String, cutoffMillis: Long): Option[Long] = {
    val times = batchAdmissionTimes(spark, dir).filter(_._1 >= 0)
    if (times.isEmpty) None
    else {
      val newest = times.map(_._1).max
      val kept = times.filter(_._2 >= cutoffMillis).map(_._1)
      Some(math.min(if (kept.nonEmpty) kept.min else newest + 1, newest))
    }
  }

  /** Time-based [[expire]]: drop batch partitions admitted before
    * `cutoffMillis` (resolved via [[keepFromForCutoff]]; the newest
    * batch always survives). `dropSeed` stays an explicit flag — the
    * seed is oldest history by definition, so the time cutoff never
    * decides it. No-op on a store with no numbered batches. */
  def expireOlderThan(
      spark: SparkSession, dir: String, cutoffMillis: Long,
      dropSeed: Boolean = false): Unit =
    keepFromForCutoff(spark, dir, cutoffMillis)
      .foreach(k => expire(spark, dir, k, dropSeed))

  /** Retention: delete `batch=N` partitions with `N < keepFromBatch`
    * (and the seed files too when `dropSeed`) — the bounded-window
    * sibling of [[compact]]: compaction bounds the FILE COUNT keeping
    * all history, expiry bounds the HISTORY ITSELF for deployments that
    * only dedup within a window. Deletion-only and idempotent — a crash
    * partway simply leaves some expired partitions for the next call —
    * so no journal is needed. */
  def expire(
      spark: SparkSession, dir: String,
      keepFromBatch: Long, dropSeed: Boolean = false,
      heldBy: Option[String] = None): Unit = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    withLease(spark, dir, heldBy) { _ =>
    val marker = new Path(root, Marker)
    if (fs.exists(marker)) throw new IllegalStateException(
      s"index dir $dir holds a compaction journal — complete the pending " +
        "compact() before expiring history")
    fs.listStatus(root).foreach { e =>
      val expired =
        (e.isDirectory && batchOf(e.getPath.getName).exists(_ < keepFromBatch)) ||
        (dropSeed && e.isFile && e.getPath.getName.endsWith(".parquet"))
      if (expired) fs.delete(e.getPath, true)
    }
    pruneStamps(spark, dir)
    }
  }

  /** Where [[quarantineOrphans]] parks partitions the checkpoint never
    * admitted. The `_` prefix hides it from [[read]]'s listing, the
    * stray-directory check, AND Spark partition discovery (the vector
    * store's read path) — quarantined data stops being history
    * everywhere without being destroyed, so a false positive (wrong
    * checkpoint path caught by the guard below, an intentional manual
    * backfill) is recoverable by renaming the partition back. */
  private val QuarantineDir = "_quarantine"

  private def logIds(fs: FileSystem, d: Path): Set[Long] =
    if (!fs.exists(d)) Set.empty
    else fs.listStatus(d).flatMap(e =>
      if (e.isFile) e.getPath.getName.toLongOption else None).toSet

  /** The stream checkpoint's view of batch ids: (committed, started).
    * `committed` lists `commits/<id>` entries — batches whose writes
    * are durable; `started` lists `offsets/<id>` — batches the stream
    * began (a started-but-uncommitted batch is replayed under the same
    * id on resume). Fails on a directory with no `offsets` log rather
    * than treating it as an empty checkpoint: against a typo'd path
    * every partition would classify as an orphan, and quarantine would
    * empty the store. */
  def checkpointBatches(
      spark: SparkSession, checkpointDir: String): (Set[Long], Set[Long]) = {
    val root = new Path(checkpointDir)
    val fs = fsOf(spark, root)
    val offsets = new Path(root, "offsets")
    if (!fs.exists(offsets)) throw new IllegalArgumentException(
      s"$checkpointDir has no offsets log — not a streaming checkpoint " +
        "(wrong path?); refusing to classify every partition as an orphan")
    (logIds(fs, new Path(root, "commits")), logIds(fs, offsets))
  }

  /** fsck for a store: classify every numbered `batch=N` partition
    * against the writing stream's checkpoint (see [[StoreCheck]]).
    * Root seed files and the `batch=-1` seed partition are backfill
    * domain — written outside any stream — and are never flagged.
    * Report-only; [[quarantineOrphans]] acts on it. */
  def verifyStore(
      spark: SparkSession, dir: String, checkpointDir: String): StoreCheck = {
    val (committed, started) = checkpointBatches(spark, checkpointDir)
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    val parts =
      if (!fs.exists(root)) Seq.empty[Long]
      else fs.listStatus(root).toSeq.flatMap(e =>
        if (e.isDirectory) batchOf(e.getPath.getName) else None)
        .filter(_ >= 0).sorted
    StoreCheck(
      committed = parts.filter(committed.contains),
      pending = parts.filter(b => started.contains(b) && !committed.contains(b)),
      orphans = parts.filter(b => !started.contains(b)))
  }

  /** Move the given numbered partitions into `_quarantine/` (shared
    * worker for [[quarantineOrphans]] and the near-dedup pair, which
    * must quarantine ONE id set across two stores). Rename-only —
    * nothing is deleted; a destination collision (re-quarantined id)
    * lands under a nonce suffix. */
  private[graft] def quarantineBatches(
      spark: SparkSession, dir: String, ids: Set[Long],
      heldBy: Option[String] = None): Seq[Long] = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    withLease(spark, dir, heldBy) { _ =>
    if (fs.exists(new Path(root, Marker))) throw new IllegalStateException(
      s"index dir $dir holds a compaction journal — complete the pending " +
        "compact() before quarantining partitions")
    val qRoot = new Path(root, QuarantineDir)
    val moved = ids.toSeq.sorted.filter { b =>
      val src = new Path(root, s"batch=$b")
      if (!fs.exists(src)) false
      else {
        fs.mkdirs(qRoot)
        val base = new Path(qRoot, s"batch=$b")
        val dst =
          if (!fs.exists(base)) base
          else new Path(qRoot,
            s"batch=$b-${java.util.UUID.randomUUID().toString.take(8)}")
        if (!fs.rename(src, dst)) throw new IllegalStateException(
          s"failed to quarantine $src to $dst — store left as-is")
        true
      }
    }
    pruneStamps(spark, dir)
    moved
    }
  }

  /** Quarantine every orphan [[verifyStore]] reports: partitions no
    * replay will ever overwrite stop being admitted as history, but
    * stay on disk under `_quarantine/` for inspection or manual
    * restore. Pending partitions are left alone — the stream's own
    * replay is their correction path. Returns the ids moved. */
  def quarantineOrphans(
      spark: SparkSession, dir: String, checkpointDir: String): Seq[Long] =
    quarantineBatches(spark, dir,
      verifyStore(spark, dir, checkpointDir).orphans.toSet)

  /** Drop stamp files whose `batch=N` partition no longer exists
    * (expired or folded into the seed) — stale stamps are harmless to
    * [[batchAdmissionTimes]] (it only maps over live partitions) but
    * would otherwise accumulate forever, the exact small-file growth
    * the maintenance ops exist to bound. Idempotent, deletion-only. */
  def pruneStamps(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    val stampRoot = new Path(root, StampDir)
    if (!fs.exists(stampRoot)) return
    val live = fs.listStatus(root).flatMap(e =>
      if (e.isDirectory) batchOf(e.getPath.getName) else None).toSet
    fs.listStatus(stampRoot).foreach { s =>
      if (!s.getPath.getName.toLongOption.exists(live.contains))
        fs.delete(s.getPath, false)
    }
  }
}
