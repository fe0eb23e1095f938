package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Durable streamed presence bitmaps — the streaming face of q190's
  * bit_or rollup, and the one summary store in the family whose merge
  * is IDEMPOTENT, not just associative and commutative: masks of a
  * union are bitwise ORs of the parts' masks, and OR-ing the same
  * batch twice changes nothing. That makes this store safe under
  * AT-LEAST-ONCE delivery by algebra alone — where the sum-based
  * stores (CountMinStream, MomentStore) rely on exactly-once batch
  * bookkeeping to avoid double-counting, a redelivered micro-batch
  * here lands on the same bits (q194 replays a batch on purpose and
  * still hash-matches q190's single-pass oracle verbatim).
  *
  * Layout (`storeDir/`): `v=N/masks` (parquet, one (grp, mask) row per
  * group) + `v=N/meta`, masks-first/meta-LAST under [[VersionedStore]]'s
  * commit recipe. Store size is O(groups) rows forever.
  */
object BitmapStore {

  private val formatTag = "bitmap-v1"

  /** Initialize an empty committed store. */
  def seed(spark: SparkSession, storeDir: String): Unit = {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("grp", "mask")
    writeVersion(spark, storeDir, 0L, empty)
  }

  /** The stored per-group masks (latest committed version). */
  def read(spark: SparkSession, storeDir: String): DataFrame = {
    val vs = VersionedStore.committedVersions(spark, storeDir)
    require(vs.nonEmpty,
      s"$storeDir holds no committed bitmaps — seed() the store first")
    readVersion(spark, storeDir, vs.max)
  }

  /** Pinned AS-OF read ([[VersionedStore.pinnedVersionDir]]'s
    * contract — refuses a retired or unknown version loudly): the
    * masks exactly as version `v` served them. */
  def readVersion(spark: SparkSession, storeDir: String, v: Long): DataFrame = {
    val dir = VersionedStore.pinnedVersionDir(spark, storeDir, v)
    // validate-only meta open: migrated() so a shimmed generation opens
    StoreLayout.migrated(spark.read.parquet(s"$dir/meta"),
      s"bitmap store at $storeDir")
    spark.read.parquet(s"$dir/masks")
  }

  private def writeVersion(
      spark: SparkSession, storeDir: String, v: Long, masks: DataFrame): Unit = {
    import spark.implicits._
    val dir = s"$storeDir/v=$v"
    masks.coalesce(1).write.mode("overwrite").parquet(s"$dir/masks")
    // meta LAST: its job-commit _SUCCESS marker commits the version
    StoreLayout.stamp(Seq(formatTag).toDF("format")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    VersionedStore.retireOldVersions(spark, storeDir, v)
  }

  /** Fold one micro-batch of (group, bucket) rows into the store:
    * reduce the batch to per-group masks (map-side partial bit_or, a
    * group-cardinality frame), OR into the stored masks, commit as
    * the next version. Buckets outside [0, 61] fail loudly — bit 62+
    * would run into the sign bit the oracle side cannot express. */
  def mergeBatch(
      batch: DataFrame, groupCol: String, bucketCol: String,
      storeDir: String): Unit = {
    val spark = batch.sparkSession
    VersionedStore.withWriteLease(spark, storeDir) {
    val stored = read(spark, storeDir)
    val batchMasks = batch
      .select(col(groupCol).as("grp"),
        // call_function, not an expr() string: splicing bucketCol into
        // SQL text would break for names needing backticks, unlike the
        // Column-API handling of the same column one line up
        when(col(bucketCol).between(0, 61),
          call_function("shiftleft", lit(1L), col(bucketCol).cast("int")))
          .otherwise(raise_error(
            lit("BitmapStore: bucket outside [0, 61]")))
          .as("b"))
      .groupBy(col("grp")).agg(bit_or(col("b")).as("mask"))
    val merged = stored.unionByName(batchMasks)
      .groupBy(col("grp")).agg(bit_or(col("mask")).as("mask"))
      // materialize BEFORE the overwrite: the merged plan reads the
      // version being superseded
      .localCheckpoint(true)
    val v = VersionedStore.committedVersions(spark, storeDir).max + 1
    writeVersion(spark, storeDir, v, merged)
    }
  }

  /** Deletes are REFUSED — loudly, by design. A bitmap mask is an OR
    * of every admitted row's bucket bit with no multiplicity: the
    * store cannot know whether a deleted (group, bucket) row was the
    * ONLY contributor to its bit, so clearing it would silently
    * under-count every surviving row that shares the bucket — the
    * same one-way information loss as the sketch stores
    * ([[CountMinStream.deleteBatch]]). Re-seed and re-merge the kept
    * rows instead; exact-algebra stores ([[MomentStore.deleteBatch]],
    * [[PostingsStream]]) subtract for real. */
  def deleteBatch(
      batch: DataFrame, groupCol: String, bucketCol: String,
      storeDir: String): Unit =
    throw new UnsupportedOperationException(
      s"BitmapStore at $storeDir cannot delete: a mask bit carries no " +
        "multiplicity, so clearing it under-corrects every surviving " +
        "row sharing the bucket. Re-seed and re-merge the kept rows " +
        "instead.")

  /** Serve q190's output shape from the store: per-group rows plus the
    * '*' global rollup (one more OR over the tiny mask table), with
    * exact distinct-bucket counts. */
  def serve(spark: SparkSession, storeDir: String): DataFrame = {
    val per = read(spark, storeDir)
    val all = per.agg(bit_or(col("mask")).as("mask"))
      .select(lit("*").as("grp"), col("mask"))
    per.select(col("grp"), col("mask")).union(all)
      .select(col("grp"), col("mask"),
        bit_count(col("mask")).cast("long").as("n_buckets"))
  }

  /** Streaming writer: one [[mergeBatch]] per micro-batch. */
  def streamTo(rows: DataFrame, groupCol: String, bucketCol: String,
      storeDir: String, checkpointDir: String): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, groupCol, bucketCol, storeDir)
        ()
      }
}
