package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

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

  test("cleanStreamDurable: full pipeline per batch, seen-but-filtered content stays dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("clean_durable").toString
    val theText = "the cat and dog of note " * 20
    val german = "der hund und die katze lief durch den garten heute " * 6
    val lowQ = "1 2 3 4 5 6 7 8 9"
    val fresh = "the quick brown fox and the lazy dog of legend ran far " * 8

    val in = MemoryStream[(Long, String)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = TrainingDataPipeline.cleanStreamDurable(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", s"$dir/ckpt") { (batch, _) =>
      emitted.synchronized {
        emitted ++= batch.select("doc_id").collect().map(_.getLong(0))
      }
    }.start()
    try {
      in.addData(
        (1L, theText),            // keeper, passes filters
        (2L, theText),            // exact dup, same batch
        (3L, theText + " extra tail"), // near dup, same batch
        (4L, german),             // unique content -> deduped in, LANG-filtered out
        (5L, lowQ))               // unique content -> deduped in, QUALITY-filtered out
      q.processAllAvailable()
      assert(emitted.toSet == Set(1L))

      in.addData(
        (6L, theText),            // exact dup of admitted 1, cross-batch
        (7L, theText + " other tail"), // near dup of admitted 1, cross-batch
        (8L, german),             // exact dup of FILTERED 4 — must stay dropped
        (9L, german + " extra schluss"), // near dup of filtered-but-admitted 4
        (10L, fresh))             // genuinely new and clean
      q.processAllAvailable()
      assert(emitted.toSet == Set(1L, 10L))
    } finally q.stop()

    // the indexes recorded dedup-stage survivors, not post-filter rows.
    // fp store = EXACT-stage survivors: each distinct content seen once
    // ({1,3,4,5} from batch 0 and {7,9,10} from batch 1 — near-dropped
    // docs 3/7/9 still have new fingerprints, so later byte-identical
    // copies drop at the cheap stage-1 probe)
    val fpCount = graft.streaming.IncrementalDedup
      .readIndex(spark, s"$dir/index/fp").count()
    assert(fpCount == 7, s"fp index rows: $fpCount")
    val bandIds = graft.streaming.NearDedupStream
      .readDocs(spark, s"$dir/index/near")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bandIds == Set(1L, 4L, 5L, 10L))
  }

  test("cleanStreamDurable == exact->near->filter batch composition (real fixture)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.table(spark, sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val (b1, b2) = docs.partition(_._1 % 2 == 0)

    val dir = java.nio.file.Files.createTempDirectory("clean_durable_parity").toString
    val in = MemoryStream[(Long, String)]
    val streamed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = TrainingDataPipeline.cleanStreamDurable(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", s"$dir/ckpt") { (batch, _) =>
      streamed.synchronized {
        streamed ++= batch.select("doc_id").collect().map(_.getLong(0))
      }
    }.start()
    try {
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()

    // independent batch twin from the primitives, stage by stage
    import graft.dedup.Dedup
    def fpsOf(rows: Seq[(Long, String)]): Map[Long, String] =
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def exactStage(rows: Seq[(Long, String)], known: Set[String]): Seq[(Long, String)] = {
      val fp = fpsOf(rows)
      val minPerFp = rows.groupBy(r => fp(r._1)).map { case (f, rs) => f -> rs.map(_._1).min }
      rows.filter(r => !known(fp(r._1)) && minPerFp(fp(r._1)) == r._1)
    }
    def withinNear(rows: Seq[(Long, String)]): Seq[(Long, String)] = {
      val drop = Dedup.jaccardOnCandidates(rows.toDF("doc_id", "text"), "doc_id", "text")
        .select("id_b").collect().map(_.getLong(0)).toSet
      rows.filterNot(r => drop(r._1))
    }
    def filterRows(rows: Seq[(Long, String)]): Set[Long] =
      rows.toDF("doc_id", "text")
        .filter(TextFunctions.langId(col("text")) === "en")
        .filter(TextFunctions.qualityScore(col("text")) >= 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet

    val e1 = exactStage(b1.toSeq, Set.empty)
    val n1 = withinNear(e1)
    val e2 = exactStage(b2.toSeq, fpsOf(e1).values.toSet)
    val n2w = withinNear(e2)
    def bands(rows: Seq[(Long, String)]) =
      Dedup.bandTable(
        Dedup.minhashSignature(rows.toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
    val cand = bands(n2w).as("nb").join(bands(n1).as("ob"), Seq("band", "bv"))
      .select(col("ob.id").as("id_a"), col("nb.id").as("id_b")).distinct()
    val crossDrop = Dedup.jaccardVerify(
        (n1 ++ n2w).toDF("doc_id", "text"), cand, "doc_id", "text")
      .select("id_b").collect().map(_.getLong(0)).toSet
    val n2 = n2w.filterNot(r => crossDrop(r._1))
    val expected = filterRows(n1) ++ filterRows(n2)
    assert(streamed.toSet == expected)
    assert(expected.nonEmpty)
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
