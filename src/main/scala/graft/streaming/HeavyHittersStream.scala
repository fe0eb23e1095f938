package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.functions.MisraGriesAgg

/** Durable streamed heavy-hitters summary — the streaming face of the
  * Misra-Gries sketch (q124), in the same spirit as the other durable
  * stores ([[IncrementalDedup]] fingerprints, [[VectorIndexStream]]
  * cells): each micro-batch's tokens reduce to a bounded per-batch
  * summary (the aggregate, map-side partial merges and all), which
  * merges into ONE stored summary via the mergeable-summaries combine
  * — so after any number of batches the store holds a valid
  * Misra-Gries summary of EVERYTHING admitted, with the full
  * N/(capacity+1) completeness + underestimate guarantees intact
  * (Agarwal et al., PODS'12: MG merging is associative w.r.t. the
  * guarantee). The store is O(capacity) bytes forever; the stream
  * never shuffles vocabulary.
  *
  * Layout (`storeDir/`): `v=N/items` (term, est) + `v=N/meta`
  * (n, capacity), written items-first/meta-LAST under
  * [[VersionedStore]]'s commit recipe (meta `_SUCCESS` marks the
  * version; readers pick the highest committed; one committed
  * predecessor retained as reader grace; crash debris skipped and
  * cleaned on the next write).
  *
  * Serving is [[heavyHitters]]: candidates from the stored summary,
  * one broadcast-IN exact recount over the admitted corpus, output =
  * exactly the true heavy hitters (complete by the guarantee, exact by
  * the recount) — deterministic regardless of batch slicing, which is
  * what lets the streamed store share q124's oracle verbatim (q128).
  */
object HeavyHittersStream {

  private def committedVersions(
      spark: SparkSession, storeDir: String): Seq[Long] =
    VersionedStore.committedVersions(spark, storeDir)

  /** Initialize an empty committed summary (version 0). */
  def seed(spark: SparkSession, storeDir: String, capacity: Int): Unit = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    writeVersion(spark, storeDir, 0L, Map.empty, 0L, capacity)
  }

  /** The stored summary: (term -> est, admitted token count, capacity)
    * at the latest committed version. */
  def read(spark: SparkSession, storeDir: String): (Map[String, Long], Long, Int) = {
    val vs = committedVersions(spark, storeDir)
    require(vs.nonEmpty,
      s"$storeDir holds no committed summary — seed() the store first")
    readVersion(spark, storeDir, vs.max)
  }

  /** Pinned AS-OF read ([[VersionedStore.pinnedVersionDir]]'s
    * contract — refuses a retired or unknown version loudly): the
    * summary exactly as version `v` served it. */
  def readVersion(spark: SparkSession, storeDir: String, v: Long)
      : (Map[String, Long], Long, Int) = {
    val dir = VersionedStore.pinnedVersionDir(spark, storeDir, v)
    val meta = StoreLayout.checkedMetaRow(
      spark, s"$dir/meta", s"heavy-hitters store at $storeDir")
    val items = spark.read.parquet(s"$dir/items").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (items, meta.getLong(0), meta.getLong(1).toInt)
  }

  private def writeVersion(
      spark: SparkSession, storeDir: String, v: Long,
      items: Map[String, Long], n: Long, capacity: Int): Unit = {
    import spark.implicits._
    val dir = s"$storeDir/v=$v"
    items.toSeq.sortBy { case (t, c) => (-c, t) }
      .toDF("term", "est").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/items")
    // meta LAST: its job-commit _SUCCESS marker commits the version
    StoreLayout.stamp(Seq((n, capacity.toLong)).toDF("n", "capacity"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    VersionedStore.retireOldVersions(spark, storeDir, v)
  }

  /** Fold one micro-batch's tokens into the stored summary: the batch
    * reduces distributed (the aggregate — one bounded buffer per
    * partition reaches the driver), the driver merges two <= capacity
    * maps, and the result commits as the next version. */
  def mergeBatch(
      batch: DataFrame, termCol: String, storeDir: String): Unit = {
    val spark = batch.sparkSession
    VersionedStore.withWriteLease(spark, storeDir) {
      val (stored, n, capacity) = read(spark, storeDir)
      val row = batch.agg(
        MisraGriesAgg.misraGries(col(termCol), capacity).as("sk"),
        count(col(termCol)).as("bn")).collect()(0)
      val batchMap = row.getSeq[Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val merged = MisraGriesAgg.mergeSummaries(
        mutable.HashMap.from(stored), batchMap, capacity)
      val v = committedVersions(spark, storeDir).max + 1
      writeVersion(spark, storeDir, v, merged.toMap, n + row.getLong(1), capacity)
    }
  }

  /** Deletes are REFUSED — loudly, by design. Misra-Gries is lossy in
    * one direction: merges DECREMENT counters and evict tokens whose
    * information is then gone, so the summary cannot know how much of
    * a deleted token's true count it already discarded — subtraction
    * would under-correct by an unknowable amount and silently break
    * the completeness guarantee (every token above N/(capacity+1)
    * survives in the summary). A delete API that silently
    * under-corrects is worse than none. Re-seed and re-merge the kept
    * corpus instead; exact-algebra stores
    * ([[MomentStore.deleteBatch]], [[PostingsStream]]) subtract for
    * real. */
  def deleteBatch(
      batch: DataFrame, termCol: String, storeDir: String): Unit =
    throw new UnsupportedOperationException(
      s"HeavyHittersStream at $storeDir cannot delete: Misra-Gries " +
        "decrements already discarded the information subtraction " +
        "would need, so a delete under-corrects by an unknowable " +
        "amount and silently voids the completeness guarantee. " +
        "Re-seed and re-merge the kept corpus instead.")

  /** Streaming writer: one [[mergeBatch]] per micro-batch. The store
    * must be seeded first. Start with `.start()`. */
  def streamTo(
      tokens: DataFrame, termCol: String, storeDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    tokens.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, termCol, storeDir)
        ()
      }

  /** Serve the true heavy hitters of the admitted corpus: candidates
    * from the stored summary, exact counts via one broadcast-IN
    * recount over `corpusTokens` (which must be the same token
    * multiset the store admitted — the stream's source of record),
    * output = tokens with exact count > N/(capacity+1). Complete by
    * the sketch guarantee, exact by the recount; both bounds are
    * require-asserted per candidate. */
  def heavyHitters(
      spark: SparkSession, storeDir: String, corpusTokens: DataFrame,
      termCol: String): DataFrame = {
    import spark.implicits._
    val (summary, n, capacity) = read(spark, storeDir)
    val threshold = n / (capacity + 1)
    val exactMap = corpusTokens
      .filter(col(termCol).isin(summary.keys.toSeq: _*))
      .groupBy(col(termCol).as("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    summary.foreach { case (t, est) =>
      val c = exactMap.getOrElse(t, 0L)
      require(est <= c && c - est <= threshold,
        s"stored summary guarantee violated for '$t': est=$est exact=$c " +
          s"allowed underestimate <= $threshold")
    }
    // the answer is <= capacity rows already in hand — build it locally
    // instead of re-running the corpus-wide recount a second time
    exactMap.toSeq.filter(_._2 > threshold).toDF("term", "cnt")
  }
}
