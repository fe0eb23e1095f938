package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** When to run maintenance — the MEASURE half of the store-maintenance
  * story ([[MaintenanceLease]] is the safety half, the journaled ops
  * the apply half). A 100 TB deployment does not run compaction on a
  * timer: it watches two liabilities and acts when they cross caps —
  *
  *  - DIRECTORY PRESSURE: every micro-batch adds a `batch=N` dir, and
  *    the per-batch listing cost is O(#dirs) — months of 5-minute
  *    batches mean ~100k directories listed per batch (the small-file
  *    scale-killer compaction exists to bound);
  *  - TOMBSTONE LIABILITY: every serving read subtracts the tombstone
  *    set (a broadcast side that grows with takedowns), and the
  *    deleted bytes remain on disk until purged — both bounded only by
  *    running [[IncrementalDedup.purgeTombstones]]-family ops.
  *
  * [[plan]] reads both gauges with driver-side listings plus one
  * tombstone-key count (never a data scan) and emits the ONE action a
  * maintenance scheduler should take, honoring the ordering contracts
  * the ops themselves enforce: on a BATCH-ORDERED store
  * (fingerprint/near-dedup/vector), compaction REFUSES while
  * tombstones exist (folding re-dates rows below every delete batch),
  * so directory pressure with any tombstones outstanding resolves to
  * PURGE — which folds everything into the seed and clears both
  * gauges at once. On a TERMINAL-tombstone store (postings),
  * compaction is fold-invariant and may run with tombstones
  * outstanding. The decision is a pure integer function of the two
  * gauges — deterministic, oracle-checkable, no timing involved.
  */
object StoreMaintenance {

  /** One store's gauges + the planned action.
    *  - `action`: "none" | "compact" | "purge"
    *  - `compactThrough`: the fold fence a "compact" action should
    *    pass (newest batch always stays, the ops' own rule); -1 when
    *    the action is not "compact". */
  final case class MaintenancePlan(
      seedFiles: Long, batchDirs: Long, maxBatch: Long,
      tombstoneKeys: Long, action: String, compactThrough: Long)

  private def listGauges(
      spark: SparkSession, dir: String): (Long, Long, Long) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) (0L, 0L, -1L)
    else {
      val entries = fs.listStatus(root)
      val seeds = entries.count(e =>
        e.isFile && e.getPath.getName.endsWith(".parquet")).toLong
      val batches = entries.toSeq.flatMap(e =>
        if (e.isDirectory && e.getPath.getName.startsWith("batch="))
          e.getPath.getName.drop("batch=".length).toLongOption
        else None).filter(_ >= 0)
      (seeds, batches.size.toLong,
        if (batches.isEmpty) -1L else batches.max)
    }
  }

  private def decide(
      batchDirs: Long, maxBatch: Long, tombstoneKeys: Long,
      maxBatchDirs: Long, maxTombstoneKeys: Long,
      compactSafeWithTombstones: Boolean): (String, Long) = {
    val dirPressure =
      batchDirs > maxBatchDirs && maxBatch > 0 // >=2 dirs: newest stays
    if (tombstoneKeys > maxTombstoneKeys) ("purge", -1L)
    else if (dirPressure && tombstoneKeys > 0 && !compactSafeWithTombstones)
      // compaction would refuse (batch-ordered resolution); purge both
      // clears the liability AND folds the directories
      ("purge", -1L)
    else if (dirPressure) ("compact", maxBatch - 1)
    else ("none", -1L)
  }

  /** Plan for a [[BatchIndex]]-layout store (fingerprint, postings, or
    * one near-dedup sub-store). `keySchema` is the tombstone key
    * schema ([[Tombstones]] layout at `dir/_tombstones`);
    * `compactSafeWithTombstones` = true only for TERMINAL-tombstone
    * stores (postings). */
  def plan(
      spark: SparkSession, dir: String, keySchema: StructType,
      maxBatchDirs: Long, maxTombstoneKeys: Long,
      compactSafeWithTombstones: Boolean = false): MaintenancePlan = {
    val (seeds, dirs, maxB) = listGauges(spark, dir)
    // fence-filtered like the masked reads: after a crash between a
    // fence-committed rewrite and the tombstone retirement, batches
    // <= the fence are already physically resolved — counting them as
    // outstanding liability would re-plan a purge that is mostly done
    val fence = Tombstones.readFence(spark, dir).getOrElse(Long.MinValue)
    val tombs =
      if (!Tombstones.exists(spark, dir)) 0L
      else Tombstones.liveKeys(spark, dir, keySchema,
        afterBatch = fence).count()
    val (action, through) = decide(dirs, maxB, tombs,
      maxBatchDirs, maxTombstoneKeys, compactSafeWithTombstones)
    MaintenancePlan(seeds, dirs, maxB, tombs, action, through)
  }

  /** Plan for a [[VectorIndexStream]] store: cell batch dirs under
    * `indexDir/cells`, tombstones under the shared [[Tombstones]]
    * layout at `indexDir/_tombstones` (batch-ordered, so compaction
    * with tombstones outstanding resolves to purge). The tombstone gauge is
    * the TERMINAL key count (what purge must resolve), not the
    * resolved [[VectorIndexStream.deadIds]] — liability is measured
    * against the stored batches, not the serve-time subtraction. */
  def planVector(
      spark: SparkSession, indexDir: String, idCol: String,
      maxBatchDirs: Long, maxTombstoneKeys: Long): MaintenancePlan = {
    val (seeds, dirs, maxB) = listGauges(spark, s"$indexDir/cells")
    val tombs = VectorIndexStream.liveTombstones(spark, indexDir, idCol)
      .count()
    val (action, through) = decide(dirs, maxB, tombs,
      maxBatchDirs, maxTombstoneKeys, compactSafeWithTombstones = false)
    MaintenancePlan(seeds, dirs, maxB, tombs, action, through)
  }

  /** The plan as a one-row frame (query-surface convenience). */
  def planFrame(spark: SparkSession, config: String,
      p: MaintenancePlan): DataFrame = {
    import spark.implicits._
    Seq((config, p.seedFiles, p.batchDirs, p.maxBatch, p.tombstoneKeys,
      p.action, p.compactThrough))
      .toDF("config", "n_seed_files", "n_batch_dirs", "max_batch",
        "tombstone_keys", "action", "compact_through")
  }

  /** EXECUTE a plan — the apply half of the scheduler step: run the
    * planned op through the store's OWN entry points (passed as
    * thunks, since every store family exposes its own compact/purge
    * signatures — and those entry points already acquire the lease,
    * journal the rewrite, and recover a crashed predecessor before
    * doing new work). A store whose op refuses (the ordering
    * contracts: batch-ordered compaction with tombstones outstanding,
    * purge-to-empty, non-invertible deletes) surfaces that refusal
    * UNCHANGED — the scheduler must see the contract violation, not
    * swallow it and report the loop healthy. Returns the action run. */
  def applyPlan(p: MaintenancePlan,
      compact: Long => Unit, purge: () => Unit): String = p.action match {
    case "compact" => compact(p.compactThrough); "compact"
    case "purge" => purge(); "purge"
    case other => other
  }

  /** ONE scheduler step, gauged on both sides: plan, apply, RE-PLAN —
    * the loop-termination proof a maintenance scheduler needs (a plan
    * whose apply does not clear the gauges would re-fire forever).
    * Output is two rows, `phase` = `1_planned` (the gauges and action
    * before) and `2_replanned` (after — a healthy loop reads `action =
    * none` here). Only the DECISION-bearing gauges are exposed
    * (`n_batch_dirs`/`max_batch`/`tombstone_keys`): the seed-file
    * count after a rewrite depends on the engine's partition
    * coalescing, which is a layout detail, not a liability. */
  def maintainFrame(spark: SparkSession, config: String,
      planner: () => MaintenancePlan,
      compact: Long => Unit, purge: () => Unit): DataFrame = {
    def row(phase: String, p: MaintenancePlan): DataFrame = {
      import spark.implicits._
      Seq((config, phase, p.batchDirs, p.maxBatch, p.tombstoneKeys,
        p.action, p.compactThrough))
        .toDF("config", "phase", "n_batch_dirs", "max_batch",
          "tombstone_keys", "action", "compact_through")
    }
    val before = planner()
    applyPlan(before, compact, purge)
    row("1_planned", before).unionByName(row("2_replanned", planner()))
  }
}
