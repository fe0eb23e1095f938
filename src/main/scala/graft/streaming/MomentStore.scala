package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.Regression

/** Durable streamed OLS — the streaming face of q156's per-group
  * regression, built on the observation the batch operator already
  * exploits: the fit's WHOLE state is the per-group moment sums
  * (n, Σx, Σy, Σxy, Σx²), and moments of a union are elementwise SUMS
  * of the parts' moments. So each micro-batch reduces distributed to
  * one bounded moments frame (group-cardinality rows, map-side partial
  * aggregation and all) and folds into the store by plain addition —
  * an EXACT, order-free merge: after any batch slicing the stored
  * moments are identical to a single-pass aggregation of everything
  * admitted, so the served slopes are a pure function of the admitted
  * rows (q158 shares its oracle shape with q156 on that strength).
  *
  * Unlike q156's batch form, x must be a pure function of the row —
  * a streaming store cannot re-center on a per-group min it hasn't
  * finished seeing — so the reference epoch is PINNED at seed time
  * (the deployment reality: you fix the time origin when you deploy)
  * and x = hours since that epoch. Negative x (a row predating the
  * epoch) fails loudly rather than silently flooring differently
  * across engines.
  *
  * Layout (`storeDir/`): `v=N/moments` (parquet) + `v=N/meta` (the
  * pinned epoch), moments-first/meta-LAST under [[VersionedStore]]'s
  * commit recipe (meta's job-commit _SUCCESS marks the version;
  * readers pick the highest committed; crash debris is skipped and
  * retired on the next write). Store size is O(groups) rows forever.
  */
object MomentStore {

  /** Initialize an empty committed store with the pinned reference
    * epoch (ISO `yyyy-MM-dd HH:mm:ss`, interpreted in session UTC). */
  def seed(spark: SparkSession, storeDir: String, epochIso: String): Unit = {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long, Long, Long, Long)]
      .toDF("grp", "n_rows", "sum_x", "sum_y", "sxy", "sxx")
    writeVersion(spark, storeDir, 0L, empty, epochIso)
  }

  /** The stored moments plus the pinned epoch (latest committed
    * version). */
  def read(spark: SparkSession, storeDir: String): (DataFrame, String) = {
    val vs = VersionedStore.committedVersions(spark, storeDir)
    require(vs.nonEmpty,
      s"$storeDir holds no committed moments — seed() the store first")
    readVersion(spark, storeDir, vs.max)
  }

  /** Pinned AS-OF read ([[VersionedStore.pinnedVersionDir]]'s
    * contract — refuses a retired or unknown version loudly): the
    * moments and epoch EXACTLY as version `v` served them; a merge
    * committed after `v` never leaks into the pin. */
  def readVersion(
      spark: SparkSession, storeDir: String, v: Long): (DataFrame, String) = {
    val dir = VersionedStore.pinnedVersionDir(spark, storeDir, v)
    val epoch = StoreLayout.checkedMetaRow(
      spark, s"$dir/meta", s"moment store at $storeDir").getString(0)
    (spark.read.parquet(s"$dir/moments"), epoch)
  }

  private def writeVersion(spark: SparkSession, storeDir: String, v: Long,
      moments: DataFrame, epochIso: String): Unit = {
    import spark.implicits._
    val dir = s"$storeDir/v=$v"
    moments.coalesce(1).write.mode("overwrite").parquet(s"$dir/moments")
    // meta LAST: its job-commit _SUCCESS marker commits the version
    StoreLayout.stamp(Seq(epochIso).toDF("epoch")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    VersionedStore.retireOldVersions(spark, storeDir, v)
  }

  /** The batch's moments under the pinned epoch: (x, y) derived
    * row-pure (x = whole hours since epoch, loud on negative; y =
    * integer value millis — both INTEGER, which is what makes merge
    * AND delete exact), reduced to one group-cardinality frame. */
  private def batchMoments(batch: DataFrame, groupCol: String,
      tsCol: String, valueCol: String, epoch: String): DataFrame = {
    val xy = batch
      .select(col(groupCol).as("grp"),
        (unix_timestamp(col(tsCol)) -
          unix_timestamp(to_timestamp(lit(epoch)))).as("secs"),
        floor(col(valueCol) * lit(1000.0)).cast("long").as("y"))
      .select(col("grp"),
        when(col("secs") >= 0, expr("secs div 3600"))
          .otherwise(raise_error(
            lit(s"MomentStore: row predates the pinned epoch $epoch")))
          .as("x"),
        col("y"))
    Regression.moments(xy, "grp", "x", "y")
  }

  private val MomentCols = Seq("n_rows", "sum_x", "sum_y", "sxy", "sxx")

  private def foldInto(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(delta)
      .groupBy(col("grp"))
      .agg(MomentCols.map(c => sum(col(c)).as(c)).head,
        MomentCols.map(c => sum(col(c)).as(c)).tail: _*)

  /** Fold one micro-batch into the store: derive (x, y) under the
    * pinned epoch, reduce to batch moments, add to the stored
    * moments, commit as the next version. */
  def mergeBatch(batch: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, storeDir: String): Unit = {
    val spark = batch.sparkSession
    VersionedStore.withWriteLease(spark, storeDir) {
      val (stored, epoch) = read(spark, storeDir)
      val merged = foldInto(
          stored, batchMoments(batch, groupCol, tsCol, valueCol, epoch))
        // materialize BEFORE the overwrite: the merged plan reads the
        // version being superseded, and lazy execution inside the write
        // job would race the retire step
        .localCheckpoint(true)
      val v = VersionedStore.committedVersions(spark, storeDir).max + 1
      writeVersion(spark, storeDir, v, merged, epoch)
    }
  }

  /** EXACT takedown by moment subtraction — the delete face the
    * store's algebra makes possible: moments are associative INTEGER
    * sums of row-pure terms, so subtracting the deleted rows' moments
    * (the same derivation [[mergeBatch]] added them under — pinned
    * epoch, integer x and y) leaves the store bit-identical to never
    * having admitted them, the postings-store argument
    * ([[PostingsStream]]'s stats decrement) applied to regression
    * state. Contrast the sketch stores, whose lossy counters are NOT
    * invertible and refuse ([[CountMinStream.deleteBatch]],
    * [[HeavyHittersStream.deleteBatch]]).
    *
    * `batch` must carry the BEFORE-IMAGES of admitted rows (the
    * standard CDC delete payload): subtraction is only exact against
    * what was merged. Two violations are structurally detectable and
    * REFUSED loudly before anything commits — a group's count going
    * negative, and a fully-deleted group leaving a nonzero moment
    * remainder (deleted rows that were never admitted). A group whose
    * rows are all deleted leaves the store (and [[slopes]]) entirely,
    * indistinguishable from never admitted; earlier committed
    * versions still serve it ([[slopesAsOf]] — the as-of fence the
    * delete does not rewrite). */
  def deleteBatch(batch: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, storeDir: String): Unit = {
    val spark = batch.sparkSession
    VersionedStore.withWriteLease(spark, storeDir) {
      val (stored, epoch) = read(spark, storeDir)
      val negated = batchMoments(batch, groupCol, tsCol, valueCol, epoch)
        .select(col("grp") +: MomentCols.map(c => (-col(c)).as(c)): _*)
      val remainder = foldInto(stored, negated).localCheckpoint(true)
      val bad = remainder.filter(col("n_rows") < 0 ||
          (col("n_rows") === 0 && MomentCols.tail
            .map(col(_) =!= 0L).reduce(_ || _)))
        .select(col("grp")).limit(5).collect().map(_.get(0))
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"MomentStore delete at $storeDir names rows never admitted " +
            s"(groups ${bad.mkString(", ")}: count went negative or a " +
            "fully-deleted group left a nonzero moment remainder) — " +
            "deletes must carry before-images of merged rows; nothing " +
            "was committed")
      val kept = remainder.filter(col("n_rows") > 0)
      val v = VersionedStore.committedVersions(spark, storeDir).max + 1
      writeVersion(spark, storeDir, v, kept, epoch)
    }
  }

  /** Serve the fitted slopes from the stored moments (q156's exact
    * output shape, `grp` renamed by the caller). */
  def slopes(spark: SparkSession, storeDir: String): DataFrame =
    Regression.slopesFromMoments(read(spark, storeDir)._1, "grp")

  /** [[slopes]] pinned to version `v` ([[readVersion]]): the fit the
    * store served at that point in its history — because the whole
    * state IS the moment sums, the pinned slopes are bit-identical to
    * a fresh aggregation of exactly the batches merged through `v`. */
  def slopesAsOf(spark: SparkSession, storeDir: String, v: Long): DataFrame =
    Regression.slopesFromMoments(readVersion(spark, storeDir, v)._1, "grp")

  /** Streaming writer: one [[mergeBatch]] per micro-batch. */
  def streamTo(rows: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, groupCol, tsCol, valueCol, storeDir)
        ()
      }
}
