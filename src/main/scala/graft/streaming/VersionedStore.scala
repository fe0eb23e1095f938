package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The one version-commit recipe the bounded-summary stores share
  * ([[HeavyHittersStream]], [[CountMinStream]]): versions live under
  * `storeDir/v=N/`, a version is committed iff its `meta/_SUCCESS`
  * job-commit marker exists (the marker file is written atomically
  * LAST by the committer; the meta DIRECTORY exists from job setup, so
  * dir presence would mis-read a crash mid-meta-write as committed),
  * readers pick the highest committed version, and cleanup retires
  * everything except the current version and ONE committed predecessor
  * (grace for a concurrent reader that just resolved the previous max
  * and is still opening its files). Crash anywhere mid-write leaves an
  * uncommitted version that readers skip and the next writer removes —
  * idempotent.
  */
private[streaming] object VersionedStore {

  def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def committedVersions(spark: SparkSession, storeDir: String): Seq[Long] = {
    val root = new Path(storeDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(e => e.isDirectory && e.getPath.getName.startsWith("v="))
      .flatMap(e => e.getPath.getName.stripPrefix("v=").toLongOption
        .filter(_ => fs.exists(new Path(e.getPath, "meta/_SUCCESS"))))
  }

  /** The root of a PINNED committed version — the as-of read for v=N
    * swap stores, answering "what did the reader that resolved
    * version v serve?" with the same contract the batch=N stores'
    * fences give ([[BatchIndex.asOf]]): a pin never sees a later
    * version. These stores retain the current version plus ONE
    * committed grace predecessor ([[retireOldVersions]]), so deeper
    * history is gone BY DESIGN: a pin outside the retained set
    * refuses loudly naming what IS retained, never silently serving
    * a different version. */
  def pinnedVersionDir(
      spark: SparkSession, storeDir: String, v: Long): String = {
    val vs = committedVersions(spark, storeDir)
    require(vs.nonEmpty,
      s"$storeDir holds no committed versions — seed the store first")
    if (!vs.contains(v)) throw new IllegalStateException(
      s"$storeDir does not retain version $v " +
        s"(retained: ${vs.sorted.mkString(", ")}) — versioned stores keep " +
        "the current version plus one committed predecessor and retire " +
        "older generations at write time; re-derive older states from " +
        "the source data instead of pinning past the grace window")
    s"$storeDir/v=$v"
  }

  /** Run one version WRITE under the store's single-writer lease. The
    * version-swap recipe is crash-safe but not concurrency-safe on its
    * own: two writers racing both resolve `max+1` as their version
    * number and the slower one silently overwrites the faster one's
    * directory — an admitted batch vanishes with no error anywhere.
    * One stream per store is the documented contract; this makes a
    * violated contract REFUSE loudly ([[MaintenanceLease]], same
    * steal-after-expiry liveness as the batch=N stores' maintenance)
    * instead of losing data. Cost: two driver-side fs ops per
    * micro-batch, noise against the parquet write. */
  def withWriteLease[T](spark: SparkSession, storeDir: String)(body: => T): T = {
    val l = MaintenanceLease.acquire(spark, storeDir,
      s"writer-${java.util.UUID.randomUUID().toString.take(8)}")
    try body finally MaintenanceLease.release(spark, l)
  }

  /** After committing `v`: delete uncommitted debris immediately and
    * committed predecessors beyond the single grace generation. */
  def retireOldVersions(
      spark: SparkSession, storeDir: String, v: Long): Unit = {
    val committed = committedVersions(spark, storeDir)
    val keepPrev = committed.filter(_ < v).sorted.lastOption
    val root = new Path(storeDir)
    val fs = fsOf(spark, root)
    fs.listStatus(root).foreach { e =>
      val name = e.getPath.getName
      name.stripPrefix("v=").toLongOption
        .filter(_ => e.isDirectory && name.startsWith("v="))
        .foreach { n2 =>
          val keep = n2 == v || (committed.contains(n2) && keepPrev.contains(n2))
          if (!keep) fs.delete(e.getPath, true)
        }
    }
  }
}
