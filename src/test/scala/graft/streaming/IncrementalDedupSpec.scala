package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {

  test("dedupStreamToIndex drops within-batch AND cross-batch duplicates durably") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup").toString
    val in = MemoryStream[(Long, String)]
    val emitted = mutable.ArrayBuffer.empty[(Long, Long)] // (batchId, doc_id)

    val q = IncrementalDedup.dedupStreamToIndex(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", s"$dir/ckpt") { (batch, id) =>
      emitted.synchronized {
        emitted ++= batch.select("doc_id").collect().map(r => id -> r.getLong(0))
      }
    }.start()
    try {
      in.addData((1L, "aaa bbb ccc"), (2L, "aaa bbb ccc"), (3L, "ddd eee fff"))
      q.processAllAvailable()
      // within-batch: fp of 1 and 2 collapse to min id 1
      assert(emitted.map(_._2).toSet == Set(1L, 3L))

      in.addData((4L, "aaa bbb ccc"), (5L, "ggg hhh iii"))
      q.processAllAvailable()
      // cross-batch: doc 4 duplicates batch-1 content -> dropped via the
      // durable index (no watermark involved); doc 5 is new
      assert(emitted.map(_._2).toSet == Set(1L, 3L, 5L))

      // case/inner-whitespace variants hit the same canonical fingerprint
      in.addData((6L, "AAA   bbb ccc"), (7L, "jjj"))
      q.processAllAvailable()
      assert(emitted.map(_._2).toSet == Set(1L, 3L, 5L, 7L))
    } finally q.stop()

    // the index holds exactly the distinct canonical fingerprints,
    // partitioned by the batch that first saw each
    val idx = spark.read.parquet(s"$dir/index")
    val fps = idx.select("fp").collect().map(_.getString(0))
    assert(fps.length == 4 && fps.distinct.length == 4)
    assert(idx.select("batch").distinct().count() == 3)

    // batch backfill path shares the same definition: re-offering old
    // content against the final index yields nothing
    val again = IncrementalDedup.dedupBatch(
      Seq((9L, "aaa bbb ccc")).toDF("doc_id", "text"), s"$dir/index", "doc_id", "text")
    assert(again.count() == 0)

    // replay safety: re-running batch 2's data AS batch 2 (dedup
    // against strictly earlier partitions) reproduces its original
    // survivors even though batch 2's own fingerprints are already in
    // the index — the post-append-crash replay case
    val batch2 = Seq((6L, "AAA   bbb ccc"), (7L, "jjj")).toDF("doc_id", "text")
    val replayed = IncrementalDedup.dedupBatch(
        batch2, s"$dir/index", "doc_id", "text", beforeBatch = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replayed == Set(7L))
    // without the batch fence the same data anti-joins its own leftovers
    val fenceless = IncrementalDedup.dedupBatch(
      batch2, s"$dir/index", "doc_id", "text")
    assert(fenceless.count() == 0)
  }

  test("streamed batches == one batch pass against the same growing index (real fixture)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.table(spark, sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val (b1, b2) = docs.partition(_._1 % 2 == 0)

    // streaming: two micro-batches through the durable index
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_parity").toString
    val in = MemoryStream[(Long, String)]
    val streamed = mutable.ArrayBuffer.empty[Long]
    val q = IncrementalDedup.dedupStreamToIndex(
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

    // batch twin: dedup b1 against empty, then b2 against b1's survivors
    val s1 = graft.dedup.Dedup.exactGroups(b1.toSeq.toDF("doc_id", "text"), "doc_id", "text")
    val survivors1 = s1.select(org.apache.spark.sql.functions.col("keep_id")).collect().map(_.getLong(0)).toSet
    val s2 = graft.dedup.Dedup.dedupAgainstIndex(
        b2.toSeq.toDF("doc_id", "text"), s1.select("fp"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed.toSet == (survivors1 ++ s2))
  }

  test("a seeded flat index (no batch partitions) counts as oldest history, not dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_seed").toString
    // a batch backfill seeds the index with plain fp rows at the root
    Seq("aaa bbb ccc").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .write.parquet(s"$dir/index")
    val out = IncrementalDedup.dedupBatch(
        Seq((1L, "aaa bbb ccc"), (2L, "new text here")).toDF("doc_id", "text"),
        s"$dir/index", "doc_id", "text", beforeBatch = 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // even for batch 0, NULL-batch seed rows are visible (coalesced to -1)
    assert(out == Set(2L))
  }

  test("a seeded index keeps working AFTER streamed batch partitions land beside it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_seed_stream").toString
    // backfill seed: flat fp-only files at the index ROOT
    Seq("aaa bbb ccc").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .write.parquet(s"$dir/index")

    val in = MemoryStream[(Long, String)]
    val emitted = mutable.ArrayBuffer.empty[Long]
    val q = IncrementalDedup.dedupStreamToIndex(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", s"$dir/ckpt") { (batch, _) =>
      emitted.synchronized {
        emitted ++= batch.select("doc_id").collect().map(_.getLong(0))
      }
    }.start()
    try {
      // batch 0 writes index/batch=0 NEXT TO the seed's root files; doc 1
      // duplicates seeded content and must be dropped via the seed rows
      in.addData((1L, "aaa bbb ccc"), (2L, "first new text"))
      q.processAllAvailable()
      assert(emitted.toSet == Set(2L))
      // the index dir now MIXES root seed files and batch=0 — the next
      // batch must still read BOTH (this is the layout partition
      // discovery alone rejects): 3 dups the seed, 4 dups batch 0
      in.addData((3L, "aaa bbb ccc"), (4L, "first new text"), (5L, "second new text"))
      q.processAllAvailable()
      assert(emitted.toSet == Set(2L, 5L))
    } finally q.stop()

    // a direct re-read of the mixed layout sees seed (batch=-1) + streamed rows
    val idx = IncrementalDedup.readIndex(spark, s"$dir/index")
    assert(idx.count() == 3)
    assert(idx.filter(org.apache.spark.sql.functions.col("batch") === -1L).count() == 1)
  }

  test("a stray non-batch subdirectory fails loudly instead of reading as absent history") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_stray").toString
    // a seed mistakenly written into a NESTED dir instead of root files
    Seq("aaa bbb ccc").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .write.parquet(s"$dir/index/seed")
    val ex = intercept[IllegalStateException] {
      IncrementalDedup.readIndex(spark, s"$dir/index").count()
    }
    assert(ex.getMessage.contains("seed"), ex.getMessage)
    assert(ex.getMessage.contains("non-batch"), ex.getMessage)
  }

  test("readIndex on a missing directory is an empty frame, so batch one works") {
    val empty = IncrementalDedup.readIndex(spark, "/tmp/does/not/exist/graft_idx")
    assert(empty.schema.fieldNames.sameElements(Array("fp", "batch")))
    assert(empty.count() == 0)
  }
}
