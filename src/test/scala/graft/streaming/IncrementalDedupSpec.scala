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

  test("fingerprint deletes: copies re-admit, re-admission revives the history, purge destroys the bytes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_del").toString
    val idx = s"$dir/index"
    def fp(texts: (Long, String)*) =
      texts.toDF("doc_id", "text")
        .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    // seed two docs' fingerprints as root files
    fp((0L, "taken down text"), (1L, "kept text here"))
      .write.parquet(idx)
    def survivors(beforeBatch: Long): Set[Long] =
      IncrementalDedup.dedupBatch(
          Seq((10L, "taken down text"), (11L, "kept text here"),
            (12L, "fresh text now")).toDF("doc_id", "text"),
          idx, "doc_id", "text", beforeBatch = beforeBatch)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors(Long.MaxValue) == Set(12L))
    // takedown: delete the first doc's fingerprint at batch 0 — ITS
    // copy re-admits, the other still drops
    IncrementalDedup.deleteBatch(spark, idx,
      fp((0L, "taken down text")), "fp", batchId = 0L)
    assert(survivors(Long.MaxValue) == Set(10L, 12L))
    // fenced BELOW the delete batch, the tombstone doesn't count yet
    assert(survivors(0L) == Set(12L))
    // the re-admitted copy's fingerprint lands at batch 1 (what the
    // stream writer would do): batch-ordered masking revives the
    // history — later copies drop again
    fp((10L, "taken down text"))
      .write.mode("overwrite").parquet(s"$idx/batch=1")
    BatchIndex.stampBatch(spark, idx, 1L)
    assert(survivors(Long.MaxValue) == Set(12L))
    // compaction REFUSES while tombstones are outstanding: folding
    // would re-date the batch-1 re-admission to the seed's batch -1
    // and flip it back to dead
    val cg = intercept[IllegalStateException] {
      IncrementalDedup.compactIndex(spark, idx, throughBatch = 0L)
    }
    assert(cg.getMessage.contains("purgeTombstones before"), cg.getMessage)
    // purge: the deleted fingerprint's batch<=0 rows are gone from
    // disk, the batch-1 re-admission survives, tombstones dropped
    IncrementalDedup.purgeTombstones(spark, idx)
    assert(!new java.io.File(s"$idx/_tombstones").exists())
    val deadFp = fp((0L, "taken down text")).collect()(0).getString(0)
    val stored = IncrementalDedup.readIndex(spark, idx)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(stored.count(_._1 == deadFp) == 1, stored.toSeq.toString)
    assert(survivors(Long.MaxValue) == Set(12L))
    // purge with no tombstones is a no-op
    IncrementalDedup.purgeTombstones(spark, idx)
    assert(survivors(Long.MaxValue) == Set(12L))
  }

  test("fingerprint purge resumes a crashed journal swap; reads refuse mid-window") {
    import spark.implicits._
    def build(idx: String): Unit = {
      Seq("fa", "fb").toDF("fp").write.parquet(idx)
      Seq("fc").toDF("fp").write.mode("overwrite").parquet(s"$idx/batch=0")
      BatchIndex.stampBatch(spark, idx, 0L)
      IncrementalDedup.deleteBatch(spark, idx,
        Seq("fa").toDF("fp"), "fp", batchId = 1L)
    }
    def stored(idx: String): Set[String] =
      IncrementalDedup.readIndex(spark, idx)
        .select("fp").collect().map(_.getString(0)).toSet

    // store A: the clean purge — expected end state
    val a = java.nio.file.Files.createTempDirectory("fp_purge_a").toString + "/index"
    build(a)
    IncrementalDedup.purgeTombstones(spark, a)
    assert(stored(a) == Set("fb", "fc"))
    assert(!new java.io.File(s"$a/_tombstones").exists())

    // store B: crashed at the WORST window — staging complete, journal
    // committed, deletions/promotions not yet performed
    val b = java.nio.file.Files.createTempDirectory("fp_purge_b").toString + "/index"
    build(b)
    Seq("fb", "fc").toDF("fp").write.parquet(s"$b/_compact_tmp")
    val stagedNames = new java.io.File(s"$b/_compact_tmp").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSeq
    val rootEntries = new java.io.File(b).listFiles().map(_.getName)
    val dLines = rootEntries.filter(n =>
      n.startsWith("batch=") || n.endsWith(".parquet")).map("D " + _)
    val mLines = stagedNames.map(n => s"M $n seed-t1-$n")
    java.nio.file.Files.writeString(
      new java.io.File(b, "_compact_journal").toPath,
      (dLines ++ mLines).mkString("", "\n", "\n"))
    intercept[IllegalStateException] {
      IncrementalDedup.readIndex(spark, b).count()
    }
    IncrementalDedup.purgeTombstones(spark, b)
    assert(stored(b) == Set("fb", "fc"))
    assert(!new java.io.File(s"$b/_tombstones").exists())
  }

  test("purge crash AFTER the swap, BEFORE the tombstone drop: the journal-committed fence keeps a re-admitted fingerprint alive") {
    import spark.implicits._
    val fpSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.StringType)))
    // fa is deleted at batch 1 and RE-ADMITTED at batch 2 — the row the
    // purge deliberately keeps, and exactly the row the pre-fence
    // protocol would destroy in this crash window (the rewrite re-dates
    // it to seed batch -1, below the still-on-disk del_batch 1)
    def build(idx: String): Unit = {
      Seq("fa", "fb").toDF("fp").write.parquet(idx)
      IncrementalDedup.deleteBatch(spark, idx,
        Seq("fa").toDF("fp"), "fp", batchId = 1L)
      Seq("fa").toDF("fp").write.mode("overwrite").parquet(s"$idx/batch=2")
      BatchIndex.stampBatch(spark, idx, 2L)
    }
    def stored(idx: String): Set[String] =
      IncrementalDedup.readIndex(spark, idx)
        .select("fp").collect().map(_.getString(0)).toSet

    // store A: the clean purge — fa's re-admission survives
    val a = java.nio.file.Files.createTempDirectory("fp_fence_a").toString + "/index"
    build(a)
    IncrementalDedup.purgeTombstones(spark, a)
    assert(stored(a) == Set("fa", "fb"))

    // store B: crash between the completed swap (journal replayed,
    // fence written by its F line) and the tombstone drop — manufacture
    // by running EXACTLY the rewrite the purge runs, and stopping
    val b = java.nio.file.Files.createTempDirectory("fp_fence_b").toString + "/index"
    build(b)
    val dead = Tombstones.maxBatchPerKey(spark, b, fpSchema)
    BatchIndex.rewriteAll(spark, b, fpSchema,
      extraJournal = Seq(Tombstones.fenceLine(1L)))(all =>
      Tombstones.maskLatest(all, dead, Seq("fp")))
    assert(new java.io.File(s"$b/_tombstones").exists())
    assert(Tombstones.readFence(spark, b) == Some(1L))
    // mid-window masked read: the fence stops del_batch 1 re-killing
    // the re-dated (batch -1) re-admission
    assert(stored(b) == Set("fa", "fb"))
    // the re-run (the documented recovery) must NOT re-apply the
    // resolved tombstones — fa survives, tombstones and fence retire
    IncrementalDedup.purgeTombstones(spark, b)
    assert(stored(b) == Set("fa", "fb"))
    assert(!new java.io.File(s"$b/_tombstones").exists())
    assert(Tombstones.readFence(spark, b).isEmpty)
    // a fresh delete AFTER the completed purge still applies (the
    // fence is gone, new tombstone batches are above any old fence)
    IncrementalDedup.deleteBatch(spark, b,
      Seq("fb").toDF("fp"), "fp", batchId = 3L)
    assert(stored(b) == Set("fa"))
  }

  test("a torn journal (no trailing newline) refuses to replay instead of half-executing its delete list") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fp_torn").toString
    val idx = s"$dir/index"
    Seq("fa", "fb").toDF("fp").write.parquet(idx)
    Seq("fc").toDF("fp").write.mode("overwrite").parquet(s"$idx/batch=0")
    Seq("fd").toDF("fp").write.mode("overwrite").parquet(s"$idx/batch=1")
    // a committed journal always ends with a newline (the atomic
    // tmp+rename write guarantees the full text or nothing) — a
    // newline-less journal is a torn manual copy whose D lines may be
    // a prefix: replaying it could delete entries whose M promotion
    // was cut off. Both replay paths must refuse it.
    java.nio.file.Files.writeString(
      new java.io.File(idx, "_compact_journal").toPath,
      "D batch=0\nM part-x seed-t1-part-x") // no trailing newline
    val ex = intercept[IllegalStateException] {
      IncrementalDedup.compactIndex(spark, idx, throughBatch = 0L)
    }
    assert(ex.getMessage.contains("trailing newline"), ex.getMessage)
    // nothing was executed: the store still holds every partition
    assert(new java.io.File(s"$idx/batch=0").exists())
    val ex2 = intercept[IllegalStateException] {
      IncrementalDedup.readIndex(spark, idx).count()
    }
    assert(ex2.getMessage.contains("compaction journal"), ex2.getMessage)
  }

  test("deleteStreamTo: each micro-batch tombstones fingerprints under its own batch id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_delstream").toString
    val idx = s"$dir/index"
    Seq("seed text").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .write.parquet(idx)
    val in = MemoryStream[String]
    val q = IncrementalDedup.deleteStreamTo(
      in.toDF().toDF("fp"), idx, s"$dir/delckpt", "fp").start()
    try {
      in.addData("f1", "f2"); q.processAllAvailable()
      in.addData("f2", "f3"); q.processAllAvailable()
    } finally q.stop()
    val live = IncrementalDedup.liveTombstones(spark, idx)
      .collect().map(_.getString(0)).toSet
    assert(live == Set("f1", "f2", "f3"))
    val parts = new java.io.File(s"$idx/_tombstones").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(parts.toSeq == Seq("batch=0", "batch=1"), parts.toSeq.toString)
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

  private def writeFps(texts: Seq[String], path: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    texts.toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .write.mode("overwrite").parquet(path)
  }

  test("compactIndex folds old fp partitions into seed files — read-equivalent, newest fenced") {
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_compact").toString
    writeFps(Seq("seed content"), s"$dir/index") // root seed
    writeFps(Seq("batch zero"), s"$dir/index/batch=0")
    writeFps(Seq("batch one"), s"$dir/index/batch=1")
    writeFps(Seq("batch two"), s"$dir/index/batch=2")
    def fps(beforeBatch: Long = Long.MaxValue): Seq[String] =
      IncrementalDedup.readIndex(spark, s"$dir/index", beforeBatch)
        .select("fp").collect().map(_.getString(0)).sorted.toSeq
    val before = fps()
    val beforeF2 = fps(beforeBatch = 2L)
    assert(before.length == 4 && beforeF2.length == 3)
    // the newest partition must stay: a crashed stream replays batch 2
    // with fence beforeBatch=2 and must NOT see its own rows as seed
    intercept[IllegalArgumentException] {
      IncrementalDedup.compactIndex(spark, s"$dir/index", throughBatch = 2L)
    }
    IncrementalDedup.compactIndex(spark, s"$dir/index", throughBatch = 1L)
    // layout: only batch=2 remains a partition; everything else is seed
    val entries = new java.io.File(s"$dir/index").listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("_"))
    assert(entries.map(_.getName).toSet == Set("batch=2"),
      entries.map(_.getName).mkString(","))
    // read-equivalent at the open fence AND at the replay fence
    assert(fps() == before)
    assert(fps(beforeBatch = 2L) == beforeF2)
    // idempotent: nothing at or below the cutoff anymore
    IncrementalDedup.compactIndex(spark, s"$dir/index", throughBatch = 1L)
    assert(fps() == before)
  }

  test("a crashed compaction is loud on read and completed by the next compact") {
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_crash").toString
    writeFps(Seq("batch zero"), s"$dir/index/batch=0")
    writeFps(Seq("batch one"), s"$dir/index/batch=1")
    val before = IncrementalDedup.readIndex(spark, s"$dir/index")
      .select("fp").collect().map(_.getString(0)).sorted.toSeq
    // simulate a crash at the worst point: rows staged and the journal
    // committed, but neither deletions nor promotions executed
    spark.read.parquet(s"$dir/index/batch=0")
      .write.parquet(s"$dir/index/_compact_tmp")
    val staged = new java.io.File(s"$dir/index/_compact_tmp").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName)
    assert(staged.nonEmpty)
    val journal = ("D batch=0" +: staged.map(n => s"M $n seed-crash-$n").toSeq)
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/index/_compact_journal"),
      journal.getBytes("UTF-8"))
    // mid-compaction state must never be silently readable
    val ex = intercept[IllegalStateException] {
      IncrementalDedup.readIndex(spark, s"$dir/index").count()
    }
    assert(ex.getMessage.contains("journal"), ex.getMessage)
    // the next compact call replays the journal, then finds nothing
    // further to fold — and the index reads exactly as before
    IncrementalDedup.compactIndex(spark, s"$dir/index", throughBatch = 0L)
    assert(!new java.io.File(s"$dir/index/_compact_journal").exists())
    assert(!new java.io.File(s"$dir/index/_compact_tmp").exists())
    val after = IncrementalDedup.readIndex(spark, s"$dir/index")
      .select("fp").collect().map(_.getString(0)).sorted.toSeq
    assert(after == before)
  }

  test("expireIndex drops history before the cutoff — expired content is re-admitted") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_expire").toString
    writeFps(Seq("old content"), s"$dir/index/batch=0")
    writeFps(Seq("new content"), s"$dir/index/batch=1")
    val batch = Seq((1L, "old content"), (2L, "new content"), (3L, "fresh"))
      .toDF("doc_id", "text")
    def survivors(): Set[Long] =
      IncrementalDedup.dedupBatch(batch, s"$dir/index", "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors() == Set(3L))
    IncrementalDedup.expireIndex(spark, s"$dir/index", keepFromBatch = 1L)
    // batch=0's fingerprint is gone: its exact copy is re-admitted,
    // the retained batch=1 content still drops
    assert(survivors() == Set(1L, 3L))
  }

  test("expireIndexOlderThan resolves a wall-clock cutoff to the batch fence (stamps, mtime fallback, newest survives)") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_expire_ts").toString
    writeFps(Seq("content a"), s"$dir/index/batch=0")
    writeFps(Seq("content b"), s"$dir/index/batch=1")
    writeFps(Seq("content c"), s"$dir/index/batch=2")
    // stamp admission times a day apart; batch=1 deliberately UNSTAMPED
    // so resolution exercises the FS-mtime fallback (its dir was just
    // written, so mtime ~ now = day3's neighborhood)
    val day = 24L * 3600 * 1000
    val now = System.currentTimeMillis()
    BatchIndex.stampBatch(spark, s"$dir/index", 0L, now - 3 * day)
    BatchIndex.stampBatch(spark, s"$dir/index", 2L, now)
    val times = BatchIndex.batchAdmissionTimes(spark, s"$dir/index").toMap
    assert(times(0L) == now - 3 * day)
    assert(times(2L) == now)
    assert(math.abs(times(1L) - now) < 10 * 60 * 1000) // mtime fallback
    val batch = Seq((1L, "content a"), (2L, "content b"), (3L, "content c"))
      .toDF("doc_id", "text")
    def survivors(): Set[Long] =
      IncrementalDedup.dedupBatch(batch, s"$dir/index", "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors() == Set.empty[Long])
    // cutoff a day ago: batch=0 (3 days old) expires, 1 and 2 stay
    IncrementalDedup.expireIndexOlderThan(spark, s"$dir/index", now - day)
    assert(survivors() == Set(1L))
    // expiry pruned batch=0's stamp alongside its partition
    assert(BatchIndex.batchAdmissionTimes(spark, s"$dir/index")
      .map(_._1).toSet == Set(1L, 2L))
    // a FUTURE cutoff degrades to keep-newest-only, never an empty store
    IncrementalDedup.expireIndexOlderThan(spark, s"$dir/index", now + day)
    assert(survivors() == Set(1L, 2L))
    val dirs = new java.io.File(s"$dir/index").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=2"), dirs.toString)
  }

  test("verifyIndex classifies partitions against the checkpoint; quarantine removes orphans from history") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_fsck").toString
    val in = MemoryStream[(Long, String)]
    val q = IncrementalDedup.dedupStreamToIndex(
      in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/ckpt")((_, _) => ()).start()
    try {
      in.addData((1L, "batch zero content")); q.processAllAvailable()
      in.addData((2L, "batch one content")); q.processAllAvailable()
    } finally q.stop()

    // healthy store: every partition committed
    assert(IncrementalDedup.verifyIndex(spark, s"$dir/index", s"$dir/ckpt")
      == StoreCheck(Seq(0L, 1L), Nil, Nil))

    // hand-built orphan: a partition under a batch id the checkpoint
    // never started (the crashed-append-then-checkpoint-reset shape) ...
    writeFps(Seq("orphan content"), s"$dir/index/batch=7")
    // ... and a pending batch: started (offsets present), commit lost
    assert(new java.io.File(s"$dir/ckpt/commits/1").delete())
    assert(IncrementalDedup.verifyIndex(spark, s"$dir/index", s"$dir/ckpt")
      == StoreCheck(Seq(0L), Seq(1L), Seq(7L)))

    // the hazard fsck exists for: the orphan acts as history — its
    // content drops incoming documents though no stream admitted it
    def survives(text: String): Boolean =
      IncrementalDedup.dedupBatch(
        Seq((99L, text)).toDF("doc_id", "text"),
        s"$dir/index", "doc_id", "text").count() == 1
    assert(!survives("orphan content"))

    // quarantine: the orphan leaves the read path; the pending batch
    // stays (replay is its correction), committed history untouched
    assert(IncrementalDedup.quarantineIndexOrphans(
      spark, s"$dir/index", s"$dir/ckpt") == Seq(7L))
    assert(IncrementalDedup.verifyIndex(spark, s"$dir/index", s"$dir/ckpt")
      == StoreCheck(Seq(0L), Seq(1L), Nil))
    assert(survives("orphan content"))
    assert(!survives("batch one content"))
    // parked, not destroyed — manual restore stays possible
    assert(new java.io.File(s"$dir/index/_quarantine/batch=7").isDirectory)

    // guard: a non-checkpoint path must fail loudly, not classify the
    // whole store as orphans
    intercept[IllegalArgumentException] {
      IncrementalDedup.verifyIndex(spark, s"$dir/index", s"$dir/no_such_ckpt")
    }
  }
}
