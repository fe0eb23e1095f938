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

  test("exactDupIds drops exactly the non-minimal ids of each fingerprint group") {
    import spark.implicits._
    val docs = Seq((10L, "a b c"), (11L, "a  b\tc"), (12L, "unique here"))
      .toDF("doc_id", "text")
    val drops = TrainingDataPipeline.exactDupIds(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(11L)) // whitespace-canonical dup of 10
  }
}
