package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.dedup.Dedup

class NearDedupStreamSpec extends SparkSpec {

  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"

  /** All messages on an exception's cause chain (task failures arrive
    * wrapped in SparkException layers). */
  private def causeChain(t: Throwable): List[String] = {
    val b = List.newBuilder[String]
    var cur: Throwable = t
    while (cur != null) {
      b += String.valueOf(cur.getMessage)
      cur = cur.getCause
    }
    b.result()
  }

  test("near-dup variants drop within-batch, cross-batch, and exactly — durably") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("near_dedup").toString
    val in = MemoryStream[(Long, String)]
    val emitted = mutable.ArrayBuffer.empty[Long]

    val q = NearDedupStream.nearDedupStreamToIndex(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", s"$dir/ckpt") { (batch, _) =>
      emitted.synchronized {
        emitted ++= batch.select("doc_id").collect().map(_.getLong(0))
      }
    }.start()
    try {
      // batch 0: 2 is a near-variant of 1 (within-batch), 3 is distinct
      in.addData(
        (1L, base),
        (2L, base + " mike november"),
        (3L, "one two three four five six seven eight nine ten eleven twelve"))
      q.processAllAvailable()
      assert(emitted.toSet == Set(1L, 3L))

      // batch 1: 4 is a DIFFERENT variant of 1 (canonical-variant case —
      // not byte-identical to anything admitted), 5 is an exact copy of
      // 1, 6 is new
      in.addData(
        (4L, base + " oscar papa"),
        (5L, base),
        (6L, "separate vocabulary entirely again here with more unique words now"))
      q.processAllAvailable()
      assert(emitted.toSet == Set(1L, 3L, 6L))
    } finally q.stop()

    // the index holds exactly the admitted docs' texts and their bands
    val docsIdx = NearDedupStream.readDocs(spark, s"$dir/index")
    assert(docsIdx.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 6L))
    val bandsIdx = NearDedupStream.readBands(spark, s"$dir/index")
    assert(bandsIdx.select("id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 3L, 6L))
    assert(bandsIdx.count() == 3 * 4) // nBands = 8 hashes / 2 rows

    // replay safety: re-running batch 1's data AS batch 1 reproduces its
    // survivors even though 6's own bands are already indexed
    val batch1 = Seq(
      (4L, base + " oscar papa"), (5L, base),
      (6L, "separate vocabulary entirely again here with more unique words now")
    ).toDF("doc_id", "text")
    val replayed = NearDedupStream.nearDedupBatch(
        batch1, s"$dir/index", "doc_id", "text", beforeBatch = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replayed == Set(6L))
    // without the fence the same data collides with its OWN admitted
    // ids — the id-reuse guard fails loudly (a silent anti-join against
    // leftovers would mask both missing fences and id recycling, and a
    // recycled id with different text would corrupt verification). The
    // guard rides the candidate join's own history scan (raise_error on
    // flagged rows — no extra job), so it surfaces when the batch's
    // result is materialized, wrapped in Spark's task-failure chain.
    val reuseEx = intercept[Exception] {
      NearDedupStream.nearDedupBatch(batch1, s"$dir/index", "doc_id", "text")
        .count()
    }
    assert(causeChain(reuseEx).exists(_.contains("reuses doc id")),
      causeChain(reuseEx).mkString(" | "))
    // backfilling over an index that already streamed batches would
    // erase the accumulated history — refused
    val ex = intercept[IllegalStateException] {
      NearDedupStream.backfillIndex(
        batch1, "doc_id", "text", s"$dir/index")
    }
    assert(ex.getMessage.contains("erase"), ex.getMessage)
  }

  test("backfillIndex seeds history the stream honors, also after its own batches land") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_backfill").toString
    NearDedupStream.backfillIndex(
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text", s"$dir/index")

    val in = MemoryStream[(Long, String)]
    val emitted = mutable.ArrayBuffer.empty[Long]
    val q = NearDedupStream.nearDedupStreamToIndex(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", s"$dir/ckpt") { (batch, _) =>
      emitted.synchronized {
        emitted ++= batch.select("doc_id").collect().map(_.getLong(0))
      }
    }.start()
    try {
      // batch 0: 1 near-dups the SEEDED doc -> dropped; 2 is new
      in.addData((1L, base + " quebec romeo"),
        (2L, "first wholly distinct new text body here"))
      q.processAllAvailable()
      assert(emitted.toSet == Set(2L))
      // batch 1 reads the MIXED layout (root seed + batch=0): 3 still
      // near-dups the seed, 4 dups batch 0's admitted doc, 5 is new
      in.addData((3L, base + " sierra tango"),
        (4L, "first wholly distinct new text body here"),
        (5L, "second wholly distinct new text body again"))
      q.processAllAvailable()
      assert(emitted.toSet == Set(2L, 5L))
    } finally q.stop()
  }

  test("edge cases: empty batch is empty, null/short texts pass through unbanded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_edge").toString
    NearDedupStream.backfillIndex(
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text", s"$dir/index")
    // empty batch: no survivors, no crash against a non-empty index
    assert(NearDedupStream.nearDedupBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      s"$dir/index", "doc_id", "text").count() == 0)
    // a null-text doc and a doc too short for any trigram produce no
    // bands, so they can never be near-dup evidence — both survive
    // (matching the batch operators' null contract), alongside a real
    // near-dup that still drops
    val out = NearDedupStream.nearDedupBatch(
        Seq((1L, null.asInstanceOf[String]), (2L, "just two"),
          (3L, base + " extra tail")).toDF("doc_id", "text"),
        s"$dir/index", "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("a hot index band is pruned under maxBucket, bounding cross-batch fan-out") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_hot").toString
    // seed THREE IDENTICAL docs via backfill (backfill admits as-is):
    // identical signatures, so EVERY (band, bv) of this content is held
    // by exactly 3 admitted docs
    val seeded = Seq((10L, base), (11L, base), (12L, base))
      .toDF("doc_id", "text")
    NearDedupStream.backfillIndex(seeded, "doc_id", "text", s"$dir/index")
    assert(NearDedupStream.readBands(spark, s"$dir/index")
      .groupBy("band", "bv").count()
      .filter(col("count") =!= 3).count() == 0)
    val probe = Seq((20L, base + " extra tail")).toDF("doc_id", "text")
    // default cap: the batch doc collides with a seeded band, verifies
    // against a seeded doc, and is dropped
    assert(NearDedupStream.nearDedupBatch(
      probe, s"$dir/index", "doc_id", "text").count() == 0)
    // maxBucket = 2: every index band is hot (3 > 2) and pruned, so the
    // probe has NO cross-batch candidates and survives — the documented
    // recall-for-boundedness trade, here made observable
    val keptCapped = NearDedupStream.nearDedupBatch(
        probe, s"$dir/index", "doc_id", "text", maxBucket = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptCapped == Set(20L))
  }

  test("nearDedupBatch plans equi-joins only — no nested loop, no cartesian") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_plan").toString
    val old = Seq((10L, base), (12L, "other text entirely for the index side here"))
      .toDF("doc_id", "text")
    Dedup.bandTable(
        Dedup.minhashSignature(old, "doc_id", "text"), "doc_id")
      .write.parquet(s"$dir/index/bands")
    old.select(col("doc_id").as("id"), col("text"))
      .write.parquet(s"$dir/index/docs")
    val out = NearDedupStream.nearDedupBatch(
      Seq((21L, base + " oscar papa"), (23L, "fresh unrelated words again"))
        .toDF("doc_id", "text"),
      s"$dir/index", "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(23L))
  }

  test("doc deletes: near-dups re-admit, the deleted id becomes re-ingestable, purge destroys both stores' bytes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_del").toString
    val idx = s"$dir/index"
    val takenDown = "alpha beta gamma delta epsilon zeta eta theta"
    val kept = "one two three four five six seven eight"
    NearDedupStream.backfillIndex(
      Seq((0L, takenDown), (1L, kept)).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    // near-copies of both seed docs (one word appended: Jaccard 6/7)
    def batch = Seq(
      (10L, takenDown + " tail"), (11L, kept + " tail"),
      (12L, "totally different words here nothing shared at all")
    ).toDF("doc_id", "text")
    def survivors(): Set[Long] =
      NearDedupStream.nearDedupBatch(batch, idx, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors() == Set(12L))
    // takedown of doc 0: its near-copy re-admits, the other still drops
    NearDedupStream.deleteBatch(spark, idx,
      Seq(0L).toDF("doc_id"), "doc_id", batchId = 0L)
    assert(survivors() == Set(10L, 12L))
    // the deleted id is re-INGESTABLE: the id-reuse guard reads the
    // masked bands, so re-admitting id 0 in a later batch no longer
    // raises (takedown-then-repost under the same id)
    val reposted = NearDedupStream.nearDedupBatch(
        Seq((0L, "a brand new reposted document body")).toDF("doc_id", "text"),
        idx, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reposted == Set(0L))

    // compaction REFUSES while tombstones are outstanding (the same
    // re-dating hazard as the other batch-ordered stores)
    val cg = intercept[IllegalStateException] {
      NearDedupStream.compactIndex(spark, idx, throughBatch = 0L)
    }
    assert(cg.getMessage.contains("purgeTombstones before"), cg.getMessage)

    // purge: doc 0's text gone from the docs store, its bands gone
    // from the band store, tombstones dropped; serving unchanged
    NearDedupStream.purgeTombstones(spark, idx)
    assert(!new java.io.File(s"$idx/_tombstones").exists())
    val docsRaw = spark.read.parquet(s"$idx/docs")
      .select("id").collect().map(_.getLong(0)).toSet
    val bandsRaw = spark.read.parquet(s"$idx/bands")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(docsRaw == Set(1L) && bandsRaw == Set(1L),
      s"docs=$docsRaw bands=$bandsRaw")
    assert(survivors() == Set(10L, 12L))
  }

  test("deleteStreamTo: each micro-batch tombstones ids under its own batch id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_delstream").toString
    val idx = s"$dir/index"
    NearDedupStream.backfillIndex(
      Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val in = MemoryStream[Long]
    val q = NearDedupStream.deleteStreamTo(
      in.toDF().toDF("doc_id"), idx, s"$dir/delckpt", "doc_id").start()
    try {
      in.addData(0L); q.processAllAvailable()
      in.addData(0L, 7L); q.processAllAvailable()
    } finally q.stop()
    val live = NearDedupStream.liveTombstones(spark, idx)
      .collect().map(_.getLong(0)).toSet
    assert(live == Set(0L, 7L))
    val parts = new java.io.File(s"$idx/_tombstones").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(parts.toSeq == Seq("batch=0", "batch=1"), parts.toSeq.toString)
  }

  test("purge crash BETWEEN the two store rewrites: re-running completes, serving equals the clean purge") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val takenDown = "alpha beta gamma delta epsilon zeta eta theta"
    val kept = "one two three four five six seven eight"
    def build(idx: String): Unit = {
      NearDedupStream.backfillIndex(
        Seq((0L, takenDown), (1L, kept)).toDF("doc_id", "text"),
        "doc_id", "text", idx)
      NearDedupStream.deleteBatch(spark, idx,
        Seq(0L).toDF("doc_id"), "doc_id", batchId = 0L)
    }
    def batch = Seq(
      (10L, takenDown + " tail"), (11L, kept + " tail")).toDF("doc_id", "text")
    def survivors(idx: String): Set[Long] =
      NearDedupStream.nearDedupBatch(batch, idx, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet

    // store A: the clean two-store purge — the expected end state
    val a = java.nio.file.Files.createTempDirectory("near_purge_a").toString + "/index"
    build(a)
    NearDedupStream.purgeTombstones(spark, a)
    val expected = survivors(a)
    assert(expected == Set(10L))

    // store B: crash AFTER the docs rewrite landed, BEFORE the bands
    // rewrite started — docs purged, bands still hold doc 0, the
    // tombstone store still present (it drops LAST). Re-running purge
    // must finish the bands side and then drop the tombstones.
    val b = java.nio.file.Files.createTempDirectory("near_purge_b").toString + "/index"
    build(b)
    BatchIndex.rewriteAll(spark, s"$b/docs",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))) { all =>
      all.filter(col("id") =!= 0L)
    }
    // the crash window's observable state: docs gone, bands present
    assert(spark.read.parquet(s"$b/docs").select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(spark.read.parquet(s"$b/bands").select("id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(new java.io.File(s"$b/_tombstones").exists())
    // the half-purged store already SERVES the purged semantics (a
    // deleted-doc band verifies against missing text and fails) —
    // masked reads make it exact even mid-window
    assert(survivors(b) == expected)
    NearDedupStream.purgeTombstones(spark, b)
    assert(!new java.io.File(s"$b/_tombstones").exists())
    assert(spark.read.parquet(s"$b/bands").select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(survivors(b) == expected)
  }

  test("purge crash between the rewrites WITH a re-ingested id: the per-store fence keeps the repost alive in both windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val takenDown = "alpha beta gamma delta epsilon zeta eta theta"
    val kept = "one two three four five six seven eight"
    val repost = "a brand new reposted document body with words"
    // id 0 is deleted at tombstone batch 0 and RE-INGESTED at batch 1
    // (takedown-then-repost under the same id — the flow the delete
    // path exists to permit); its batch-1 rows are exactly what a
    // fence-less crash window would flip back to dead and a purge
    // re-run would then destroy
    def build(idx: String): Unit = {
      NearDedupStream.backfillIndex(
        Seq((0L, takenDown), (1L, kept)).toDF("doc_id", "text"),
        "doc_id", "text", idx)
      NearDedupStream.deleteBatch(spark, idx,
        Seq(0L).toDF("doc_id"), "doc_id", batchId = 0L)
      val reposted = Seq((0L, repost)).toDF("id", "text")
      reposted.write.parquet(s"$idx/docs/batch=1")
      graft.dedup.Dedup.bandTable(
          graft.dedup.Dedup.minhashSignature(reposted, "id", "text", 8, 3),
          "id", 8, 2)
        .write.parquet(s"$idx/bands/batch=1")
      BatchIndex.stampBatch(spark, s"$idx/docs", 1L)
      BatchIndex.stampBatch(spark, s"$idx/bands", 1L)
    }
    // a near-copy of the REPOST must drop (its history is alive), a
    // near-copy of the taken-down text must admit
    def batch = Seq(
      (20L, takenDown + " tail"), (21L, repost + " tail")).toDF("doc_id", "text")
    def survivors(idx: String): Set[Long] =
      NearDedupStream.nearDedupBatch(batch, idx, "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    def docIds(idx: String): Set[(Long, Long)] =
      NearDedupStream.readDocs(spark, idx)
        .select("id", "batch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // store A: the clean purge — the repost survives both stores
    val a = java.nio.file.Files.createTempDirectory("near_fence_a").toString + "/index"
    build(a)
    assert(survivors(a) == Set(20L))
    NearDedupStream.purgeTombstones(spark, a)
    assert(survivors(a) == Set(20L))
    assert(spark.read.parquet(s"$a/docs").select("id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L))

    // store B: crash after the docs rewrite (journal replayed, fence
    // committed by its F line) and before the bands rewrite —
    // manufacture by running EXACTLY the docs step the purge runs
    val b = java.nio.file.Files.createTempDirectory("near_fence_b").toString + "/index"
    build(b)
    val idSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val dead = Tombstones.maxBatchPerKey(spark, b, idSchema)
    BatchIndex.rewriteAll(spark, s"$b/docs", docsSchema,
      extraJournal = Seq(Tombstones.fenceLine(0L)))(all =>
      Tombstones.maskLatest(all, dead, Seq("id")))
    assert(new java.io.File(s"$b/_tombstones").exists())
    assert(Tombstones.readFence(spark, s"$b/docs") == Some(0L))
    assert(Tombstones.readFence(spark, s"$b/bands").isEmpty)
    // mid-window: the docs store is re-dated but FENCED (the repost
    // reads alive at batch -1); the bands store still masks the full
    // tombstone set batch-ordered (id 0's batch-1 bands revive, its
    // seed bands stay dead) — and serving equals the clean purge
    assert(docIds(b) == Set((0L, -1L), (1L, -1L)))
    assert(survivors(b) == Set(20L))
    // the re-run completes the bands side WITHOUT re-applying the
    // resolved tombstones to the re-dated docs store
    NearDedupStream.purgeTombstones(spark, b)
    assert(!new java.io.File(s"$b/_tombstones").exists())
    assert(Tombstones.readFence(spark, s"$b/docs").isEmpty)
    assert(Tombstones.readFence(spark, s"$b/bands").isEmpty)
    assert(spark.read.parquet(s"$b/docs").select("id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(spark.read.parquet(s"$b/bands").select("id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(survivors(b) == Set(20L))
  }

  test("compactIndex folds both stores — near-dedup behavior unchanged at every future fence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_compact").toString
    val texts = Seq(
      base,
      "one two three four five six seven eight nine ten eleven twelve",
      "separate vocabulary entirely again here with more unique words now")
    val in = MemoryStream[(Long, String)]
    val q = NearDedupStream.nearDedupStreamToIndex(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", s"$dir/ckpt") { (_, _) => () }.start()
    try {
      texts.zipWithIndex.foreach { case (t, i) =>
        in.addData((i.toLong + 1, t)); q.processAllAvailable()
      }
    } finally q.stop()

    def bandRows(): Seq[(Long, Int, String)] =
      NearDedupStream.readBands(spark, s"$dir/index")
        .select("id", "band", "bv").as[(Long, Int, String)].collect().sorted.toSeq
    def docRows(): Seq[(Long, String)] =
      NearDedupStream.readDocs(spark, s"$dir/index")
        .select("id", "text").as[(Long, String)].collect().sorted.toSeq
    val (bandsBefore, docsBefore) = (bandRows(), docRows())
    assert(bandsBefore.map(_._1).distinct == Seq(1L, 2L, 3L))
    val probe = Seq((50L, base + " extra tail")).toDF("doc_id", "text")
    assert(NearDedupStream.nearDedupBatch(
      probe, s"$dir/index", "doc_id", "text").count() == 0)

    NearDedupStream.compactIndex(spark, s"$dir/index", throughBatch = 1L)
    // both stores keep only the newest partition; older history is seed
    Seq("bands", "docs").foreach { sub =>
      val dirs = new java.io.File(s"$dir/index/$sub").listFiles()
        .filter(f => f.isDirectory && !f.getName.startsWith("_"))
      assert(dirs.map(_.getName).toSet == Set("batch=2"), sub)
    }
    assert(bandRows() == bandsBefore)
    assert(docRows() == docsBefore)
    // a near-dup of compacted (batch 0) history still drops
    assert(NearDedupStream.nearDedupBatch(
      probe, s"$dir/index", "doc_id", "text").count() == 0)
    // and the replay fence still excludes the newest partition only
    assert(NearDedupStream.readBands(spark, s"$dir/index", beforeBatch = 2L)
      .select("id").distinct().as[Long].collect().toSet == Set(1L, 2L))
  }

  test("expireIndex: expired history stops producing candidates, retained history still drops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_expire").toString
    val otherBase =
      "uniform quebec romeo sierra tango victor whiskey xray yankee zulu adams baker"
    // hand-laid batch partitions: docA admitted by batch 0, docB by batch 1
    Seq((10L, base), (11L, otherBase)).zipWithIndex.foreach { case ((id, t), b) =>
      val d = Seq((id, t)).toDF("doc_id", "text")
      d.select(col("doc_id").as("id"), col("text"))
        .write.parquet(s"$dir/index/docs/batch=$b")
      Dedup.bandTable(Dedup.minhashSignature(d, "doc_id", "text"), "doc_id")
        .write.parquet(s"$dir/index/bands/batch=$b")
    }
    val probes = Seq((50L, base + " extra tail"), (51L, otherBase + " extra tail"))
      .toDF("doc_id", "text")
    def kept(): Set[Long] =
      NearDedupStream.nearDedupBatch(probes, s"$dir/index", "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept() == Set.empty[Long]) // both near-dup admitted history
    NearDedupStream.expireIndex(spark, s"$dir/index", keepFromBatch = 1L)
    // docA's history is expired: its variant is re-admitted; docB's is
    // retained: its variant still drops
    assert(kept() == Set(50L))
    // seed expiry: a backfilled index stops matching once dropSeed purges it
    val seedDir = java.nio.file.Files.createTempDirectory("near_dedup_expire_seed").toString
    NearDedupStream.backfillIndex(
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text", s"$seedDir/index")
    val probeA = Seq((60L, base + " extra tail")).toDF("doc_id", "text")
    assert(NearDedupStream.nearDedupBatch(
      probeA, s"$seedDir/index", "doc_id", "text").count() == 0)
    NearDedupStream.expireIndex(spark, s"$seedDir/index",
      keepFromBatch = 0L, dropSeed = true)
    assert(NearDedupStream.nearDedupBatch(
      probeA, s"$seedDir/index", "doc_id", "text").count() == 1)
  }

  test("verifyIndex reports per store; quarantine moves the UNION of orphans from both") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("near_dedup_fsck").toString
    val in = MemoryStream[(Long, String)]
    val q = NearDedupStream.nearDedupStreamToIndex(
      in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/ckpt")((_, _) => ()).start()
    try {
      in.addData((1L, base)); q.processAllAvailable()
    } finally q.stop()

    // orphan vocabulary disjoint from the admitted corpus, so its drops
    // are attributable to the orphan alone
    val orphanText = "quartz marble granite slate basalt pumice obsidian " +
      "shale gneiss schist quartzite limestone"
    // orphan in DOCS only: the crash-between-the-pair's-writes shape,
    // abandoned (checkpoint reset, so no replay will ever fix it)
    Seq((50L, orphanText + " quebec romeo")).toDF("id", "text")
      .write.parquet(s"$dir/index/docs/batch=7")
    // orphan in BOTH stores under another id
    Seq((60L, orphanText)).toDF("id", "text")
      .write.parquet(s"$dir/index/docs/batch=8")
    Dedup.bandTable(
        Dedup.minhashSignature(
          Seq((60L, orphanText)).toDF("doc_id", "text"), "doc_id", "text"),
        "doc_id")
      .write.parquet(s"$dir/index/bands/batch=8")

    val report = NearDedupStream.verifyIndex(spark, s"$dir/index", s"$dir/ckpt")
    assert(report("docs") == StoreCheck(Seq(0L), Nil, Seq(7L, 8L)), report.toString)
    assert(report("bands") == StoreCheck(Seq(0L), Nil, Seq(8L)), report.toString)

    // the hazard: a variant of the orphan's content is dropped though
    // no stream ever admitted it
    def survivors(): Set[Long] = NearDedupStream.nearDedupBatch(
        Seq((70L, orphanText + " sierra tango")).toDF("doc_id", "text"),
        s"$dir/index", "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors() == Set.empty[Long])

    // one union id set leaves BOTH stores (7 absent from bands: skipped)
    assert(NearDedupStream.quarantineIndexOrphans(
      spark, s"$dir/index", s"$dir/ckpt") == Seq(7L, 8L))
    val after = NearDedupStream.verifyIndex(spark, s"$dir/index", s"$dir/ckpt")
    assert(after("docs") == StoreCheck(Seq(0L), Nil, Nil), after.toString)
    assert(after("bands") == StoreCheck(Seq(0L), Nil, Nil), after.toString)
    // quarantined history no longer produces candidates
    assert(survivors() == Set(70L))
  }

  test("streamed near-dedup == the batch candidates->verify composition (real fixture)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.table(spark, sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val (b1, b2) = docs.partition(_._1 % 2 == 0)

    val dir = java.nio.file.Files.createTempDirectory("near_dedup_parity").toString
    val in = MemoryStream[(Long, String)]
    val streamed = mutable.ArrayBuffer.empty[Long]
    val q = NearDedupStream.nearDedupStreamToIndex(
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

    // batch twin, composed INDEPENDENTLY from the Dedup primitives:
    // survivors of b1 = b1 minus larger ids of its verified pairs
    def withinSurvivors(b: Seq[(Long, String)]): Seq[(Long, String)] = {
      val drop = Dedup.jaccardOnCandidates(
          b.toDF("doc_id", "text"), "doc_id", "text")
        .select("id_b").collect().map(_.getLong(0)).toSet
      b.filterNot(d => drop(d._1))
    }
    val s1 = withinSurvivors(b1.toSeq)
    val s2w = withinSurvivors(b2.toSeq)
    // cross-batch: band collisions between b2's within-survivors and s1
    def bands(rows: Seq[(Long, String)]) =
      Dedup.bandTable(
        Dedup.minhashSignature(rows.toDF("doc_id", "text"), "doc_id", "text"),
        "doc_id")
    val cand = bands(s2w).as("nb")
      .join(bands(s1).as("ob"), Seq("band", "bv"))
      .select(col("ob.id").as("id_a"), col("nb.id").as("id_b")).distinct()
    val crossDrop = Dedup.jaccardVerify(
        (s1 ++ s2w).toDF("doc_id", "text"), cand, "doc_id", "text")
      .select("id_b").collect().map(_.getLong(0)).toSet
    val expected = s1.map(_._1).toSet ++ s2w.map(_._1).filterNot(crossDrop).toSet
    assert(streamed.toSet == expected)
    // the fixture actually exercises the near-dup path across batches
    assert(crossDrop.nonEmpty || Dedup.jaccardOnCandidates(
      docs.toSeq.toDF("doc_id", "text"), "doc_id", "text").count() == 0)
  }
}
