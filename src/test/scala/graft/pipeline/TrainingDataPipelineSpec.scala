package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingDataPipelineSpec extends SparkSpec {

  test("clean drops exact dups, near dups, off-language and low-quality docs") {
    import spark.implicits._
    val the20 = Array.fill(20)("the cat and dog of note").mkString(" ")
    val docs = Seq(
      (1L, the20),                                     // keeper (en, long, quality)
      (2L, the20),                                     // exact dup of 1
      (3L, the20 + " extra tail words here"),          // near dup of 1
      (4L, "der hund und die katze " * 20),            // german -> lang filter
      (5L, "x")                                        // low quality
    ).toDF("doc_id", "text")
    val kept = TrainingDataPipeline.clean(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    // persistStages path: same result, stages cached instead of recomputed
    val keptPersisted = TrainingDataPipeline
      .clean(docs, "doc_id", "text", persistStages = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptPersisted == Set(1L))
    spark.catalog.clearCache()
  }

  test("stats are monotonically non-increasing across stages on real docs") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val s = TrainingDataPipeline.stats(d, "doc_id", "text",
      keepLangs = Seq("en", "und"), minQuality = 0.0)
    assert(s.input == 500)
    assert(s.afterExact <= s.input)
    assert(s.afterNear <= s.afterExact)
    assert(s.afterLang <= s.afterNear)
    assert(s.afterQuality <= s.afterLang)
    assert(s.afterNear < s.input) // planted near-dups exist in testdata
    assert(s.afterQuality > 0)
  }

  test("clean() never broadcast-hints its O(corpus) drop/keep lists") {
    // AQE may still broadcast a genuinely-small side at runtime (good); what
    // must NOT happen is a forced broadcast of unbounded id lists.
    val d = graft.Tables.table(spark, sf001, "documents")
    val plan = TrainingDataPipeline.clean(d, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("broadcast"), s"broadcast hint in:\n$plan")
  }

  test("cleanStream: watermarked dedup + per-row lang/quality filters over a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val the20 = Array.fill(20)("the cat and dog of note").mkString(" ")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = TrainingDataPipeline.cleanStream(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, the20, t0),                          // keeper
        (2L, the20, t0),                          // exact dup of 1 (same batch)
        (4L, "der hund und die katze " * 20, t0), // german -> lang filter
        (5L, "x", t0))                            // low quality
      q.processAllAvailable()
      in.addData((6L, the20, t0))                 // dup of 1, later batch in window
      q.processAllAvailable()
      val kept = spark.table("clean_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L)) // first-seen fingerprint wins; filters drop 4,5
    } finally q.stop()
  }

  test("cleanStream == batch clean minus near-dedup on real docs (parity gate)") {
    // The streaming pipeline's contract: identical survivors to the batch
    // clean() with the near-dedup stage removed, up to the documented
    // keeper-choice difference (first-seen vs min-id). Parity is
    // asserted on surviving FINGERPRINTS, which is keeper-invariant
    // PROVIDED duplicate texts are raw-identical (a canonical-only dup
    // like "a  b" vs "a b" could pass the quality filter under one
    // keeper and fail under the other). The fixture has no duplicate
    // fingerprints at all, so raw-identical copies of real docs are
    // planted across BOTH batches — that is what actually exercises the
    // cross-batch watermark dedup state. This also pins the per-row
    // filter forms (TextFunctions.langId / qualityScore) to their
    // aggregate twins (TextAnalysis.*ByDoc) on the real distribution.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.{TextAnalysis, TextFunctions}

    val base = graft.Tables.table(spark, sf001, "documents")
      .select("doc_id", "text")
    // raw-identical duplicates of the first 10 docs, new ids
    val dups = base.orderBy(col("doc_id")).limit(10)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val docs = base.union(dups)
    val keepLangs = Seq("en", "und")
    val minQuality = 0.5

    // batch twin: exact dedup -> lang filter -> quality (no near-dedup)
    val drops = TrainingDataPipeline.exactDupIds(docs, "doc_id", "text")
    val d1 = docs.join(drops, docs("doc_id") === drops("id"), "left_anti")
    val lang = TextAnalysis.langIdByDoc(d1, "doc_id", "text")
      .filter(col("lang_pred").isin(keepLangs: _*)).select(col("doc_id").as("kid"))
    val d2 = d1.join(lang, d1("doc_id") === col("kid"), "left_semi")
    val qual = TextAnalysis.qualityByDoc(d2, "doc_id", "text")
      .filter(col("quality") >= minQuality).select(col("doc_id").as("qid"))
    val batchFps = d2.join(qual, d2("doc_id") === col("qid"), "left_semi")
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet

    // stream the same docs in two micro-batches
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // sorted by id: the planted dups (ids 100000+) land in the second
    // micro-batch, their originals in the first -> cross-batch dedup
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), t0)).sortBy(_._1)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = TrainingDataPipeline.cleanStream(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      "10 minutes", keepLangs, minQuality)
    val q = out.writeStream.format("memory").queryName("clean_parity")
      .outputMode("append").start()
    try {
      val (half1, half2) = rows.splitAt(rows.length / 2)
      in.addData(half1.toSeq)
      q.processAllAvailable()
      in.addData(half2.toSeq) // cross-batch dups deduped by watermark state
      q.processAllAvailable()
      val streamFps = spark.table("clean_parity")
        .select(TextFunctions.fingerprint(col("text")).as("fp"))
        .collect().map(_.getString(0)).toSet
      assert(streamFps == batchFps)
      assert(streamFps.nonEmpty)
      // one survivor per fingerprint on both sides
      assert(spark.table("clean_parity").count() == streamFps.size)
    } finally q.stop()
  }

  test("exactDupIds drops exactly the non-minimal ids of each fingerprint group") {
    import spark.implicits._
    val docs = Seq((10L, "a b c"), (11L, "a  b\tc"), (12L, "unique here"))
      .toDF("doc_id", "text")
    val drops = TrainingDataPipeline.exactDupIds(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(11L)) // whitespace-canonical dup of 10
  }
}
