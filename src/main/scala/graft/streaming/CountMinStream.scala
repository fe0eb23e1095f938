package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.util.sketch.CountMinSketch

/** Durable streamed Count-Min summary — the streaming face of q137's
  * point-frequency sketch, the ad-hoc-lookup sibling of
  * [[HeavyHittersStream]]'s candidate-set summary: each micro-batch's
  * tokens reduce distributed to one bounded depth x width counter
  * array (Spark's built-in count_min_sketch aggregate — map-side
  * partial merges and all), which the driver folds into the stored
  * sketch via counter addition (`mergeInPlace`). Because every counter
  * is a SUM, the merge is exact and order-free: after any number of
  * batches the stored bytes are BIT-IDENTICAL to a single-pass sketch
  * of everything admitted (spec-asserted), so every one-pass guarantee
  * — never undercounts, overcount <= ceil(eps * N) — survives any
  * batch slicing verbatim. The store is O(depth x width) bytes
  * forever; the stream never shuffles vocabulary.
  *
  * Layout (`storeDir/`): `v=N/sketch` (one binary row) + `v=N/meta`
  * (eps, confidence, seed), sketch-first/meta-LAST under
  * [[VersionedStore]]'s commit recipe (meta `_SUCCESS` marks the
  * version; readers pick the highest committed; one committed
  * predecessor retained as reader grace; crash debris skipped and
  * cleaned on the next write). The admitted count N is the sketch's
  * own totalCount — no separate bookkeeping to drift from it.
  *
  * Serving is [[estimates]]: probe keys estimated from the stored
  * sketch, gated per key against an exact broadcast-IN recount of the
  * admitted corpus — q142 shares q137's oracle VERBATIM because the
  * exact-parity of merge makes the output a pure function of the
  * corpus, independent of batch slicing.
  */
object CountMinStream {

  /** Initialize an empty committed sketch (version 0). The (eps,
    * confidence, seed) triple is pinned at seed time: merge requires
    * identical dimensions and hash seeds, so every batch reuses it. */
  def seed(
      spark: SparkSession, storeDir: String,
      eps: Double, confidence: Double, sketchSeed: Int): Unit = {
    require(eps > 0 && eps < 1, s"eps in (0,1) required, got $eps")
    require(confidence > 0 && confidence < 1,
      s"confidence in (0,1) required, got $confidence")
    writeVersion(spark, storeDir, 0L,
      CountMinSketch.create(eps, confidence, sketchSeed),
      eps, confidence, sketchSeed)
  }

  /** The stored sketch plus its pinned parameters (latest committed
    * version). */
  def read(spark: SparkSession, storeDir: String)
      : (CountMinSketch, Double, Double, Int) = {
    val vs = VersionedStore.committedVersions(spark, storeDir)
    require(vs.nonEmpty,
      s"$storeDir holds no committed sketch — seed() the store first")
    readVersion(spark, storeDir, vs.max)
  }

  /** Pinned AS-OF read ([[VersionedStore.pinnedVersionDir]]'s
    * contract — refuses a retired or unknown version loudly): the
    * sketch exactly as version `v` served it; later merges never
    * leak into the pin. */
  def readVersion(spark: SparkSession, storeDir: String, v: Long)
      : (CountMinSketch, Double, Double, Int) = {
    val dir = VersionedStore.pinnedVersionDir(spark, storeDir, v)
    val meta = StoreLayout.checkedMetaRow(
      spark, s"$dir/meta", s"Count-Min store at $storeDir")
    val bytes = spark.read.parquet(s"$dir/sketch")
      .collect()(0).getAs[Array[Byte]](0)
    (CountMinSketch.readFrom(bytes),
      meta.getDouble(0), meta.getDouble(1), meta.getLong(2).toInt)
  }

  private def writeVersion(
      spark: SparkSession, storeDir: String, v: Long, sk: CountMinSketch,
      eps: Double, confidence: Double, sketchSeed: Int): Unit = {
    import spark.implicits._
    val dir = s"$storeDir/v=$v"
    val bos = new java.io.ByteArrayOutputStream()
    sk.writeTo(bos)
    Seq(bos.toByteArray).toDF("sketch").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/sketch")
    // meta LAST: its job-commit _SUCCESS marker commits the version
    StoreLayout.stamp(
        Seq((eps, confidence, sketchSeed.toLong)).toDF("eps", "confidence", "seed"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    VersionedStore.retireOldVersions(spark, storeDir, v)
  }

  /** Fold one micro-batch's tokens into the stored sketch: the batch
    * reduces distributed under the store's pinned parameters, the
    * driver adds the two counter arrays, and the result commits as
    * the next version. */
  def mergeBatch(
      batch: DataFrame, termCol: String, storeDir: String): Unit = {
    val spark = batch.sparkSession
    VersionedStore.withWriteLease(spark, storeDir) {
      val (stored, eps, confidence, sketchSeed) = read(spark, storeDir)
      val row = batch.agg(count_min_sketch(
        col(termCol), lit(eps), lit(confidence), lit(sketchSeed)).as("sk"))
        .collect()(0)
      val batchSk = CountMinSketch.readFrom(row.getAs[Array[Byte]](0))
      stored.mergeInPlace(batchSk)
      val v = VersionedStore.committedVersions(spark, storeDir).max + 1
      writeVersion(spark, storeDir, v, stored, eps, confidence, sketchSeed)
    }
  }

  /** Deletes are REFUSED — loudly, by design. A Count-Min sketch is
    * not invertible: each counter is the sum of EVERY colliding
    * term's count, so subtracting a deleted term's contribution would
    * also subtract it from every term it collides with, silently
    * breaking the sketch's one guarantee (estimate >= true count —
    * under-estimates are exactly what CM promises never to produce).
    * A delete API that silently under-corrects is worse than none.
    * Takedowns over sketched corpora re-seed and re-merge the kept
    * slice instead; stores whose state is exact integer algebra
    * ([[MomentStore.deleteBatch]], [[PostingsStream]]) subtract for
    * real. */
  def deleteBatch(
      batch: DataFrame, termCol: String, storeDir: String): Unit =
    throw new UnsupportedOperationException(
      s"CountMinStream at $storeDir cannot delete: Count-Min counters " +
        "sum colliding terms, so subtraction under-corrects every " +
        "collider and silently voids the estimate >= true-count " +
        "guarantee. Re-seed and re-merge the kept corpus instead.")

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

  /** Serve gated point estimates for `probes` (one string key per
    * row): estimates from the stored sketch, exact truth via one
    * broadcast-joined recount of `corpusTokens` (the same token
    * multiset the store admitted — the stream's source of record),
    * output (term, exact cnt, within_bound). Exact-merge parity makes
    * this a pure function of the corpus — q142 shares q137's oracle
    * verbatim. */
  def estimates(
      spark: SparkSession, storeDir: String, corpusTokens: DataFrame,
      termCol: String, probes: DataFrame): DataFrame = {
    import spark.implicits._
    val (sk, eps, _, _) = read(spark, storeDir)
    val bound = math.ceil(eps * sk.totalCount()).toLong
    val p = probes.select(col(termCol).as("term")).distinct()
    val exact = corpusTokens.select(col(termCol).as("term"))
      .join(broadcast(p), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    exact.toSeq.map { case (t, c) =>
      val est = sk.estimateCount(t)
      (t, c, est >= c && est <= c + bound)
    }.toDF("term", "cnt", "within_bound")
  }
}
