package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.corpus.TextRetrieval

class PostingsStreamSpec extends SparkSpec {

  private def ranks(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("served BM25 == batch operator over the union corpus (q103's exactness contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.table(spark, sf001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("postings").toString

    PostingsStream.backfillIndex(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", s"$dir/index")

    // stream the odd half in two micro-batches
    val odd = d.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (b0, b1) = odd.partition(_._1 % 4 == 1)
    val in = MemoryStream[(Long, String)]
    val q = PostingsStream.postingsStreamTo(
      in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", s"$dir/ckpt")().start()
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    val queries = d.filter(col("doc_id") % 100 === 0)
    val served = ranks(PostingsStream.bm25TopK(
      spark, s"$dir/index", queries, "doc_id", "text", k = 5, excludeSelf = true))
    val batch = ranks(TextRetrieval.bm25TopK(
      d, "doc_id", "text", queries, "doc_id", "text", k = 5, excludeSelf = true))
    assert(served == batch)
    assert(served.nonEmpty)

    // fence: beforeBatch = 0 scores against the seed half only
    val fenced = ranks(PostingsStream.bm25TopK(
      spark, s"$dir/index", queries, "doc_id", "text",
      k = 5, excludeSelf = true, beforeBatch = 0))
    val seedBatch = ranks(TextRetrieval.bm25TopK(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      queries, "doc_id", "text", k = 5, excludeSelf = true))
    assert(fenced == seedBatch)
    assert(fenced != served)

    // replay: re-appending batch 1 under its own id changes nothing
    PostingsStream.appendBatch(
      b1.toDF("doc_id", "text"), "doc_id", "text", s"$dir/index", 1L)
    assert(ranks(PostingsStream.bm25TopK(
      spark, s"$dir/index", queries, "doc_id", "text",
      k = 5, excludeSelf = true)) == served)

    // compaction folds batch 0 into the seed; full-fence answers unchanged
    PostingsStream.compactIndex(spark, s"$dir/index", throughBatch = 0)
    assert(ranks(PostingsStream.bm25TopK(
      spark, s"$dir/index", queries, "doc_id", "text",
      k = 5, excludeSelf = true)) == served)

    // retention: dropping everything before batch 1 (seed included)
    // leaves only batch 1's docs as candidates
    PostingsStream.expireIndex(spark, s"$dir/index", keepFromBatch = 1, dropSeed = true)
    val retained = PostingsStream.readPostings(spark, s"$dir/index")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(retained == b1.map(_._1).toSet)
    val afterExpire = PostingsStream.bm25TopK(
      spark, s"$dir/index", queries, "doc_id", "text", k = 5, excludeSelf = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterExpire.subsetOf(retained))
  }

  test("moreLikeThis: served hybrid == hand-computed RRF of the two served arms; documents never read") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("postings_mlt").toString
    PostingsStream.backfillIndex(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", s"$dir/index")
    PostingsStream.appendBatch(
      d.filter(col("doc_id") % 2 === 1), "doc_id", "text", s"$dir/index", 0L)

    // query ids taken from the store itself (q108's shape) so the whole
    // serving plan — ids included — derives from stored postings alone
    val queryIds = PostingsStream.readPostings(spark, s"$dir/index")
      .select(col("doc_id")).distinct()
      .filter(col("doc_id") % 100 === 0)
    val served = PostingsStream.moreLikeThis(
      spark, s"$dir/index", queryIds, "doc_id", k = 5, poolK = 20)

    // every file the plan scans is inside the store — the query ids are
    // a broadcast input, and neither arm touches documents.parquet
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains(dir), plan)
    assert(!plan.contains("documents.parquet"), plan)

    // hand-compute the fusion from the two arms served independently
    val queries = d.filter(col("doc_id") % 100 === 0)
    val a = ranks(PostingsStream.bm25TopK(
        spark, s"$dir/index", queries, "doc_id", "text",
        k = 20, excludeSelf = true))
      .map { case (q, r, doc) => (q, doc) -> r }.toMap
    // overlap arm brute-forced in plain Scala: distinct shared terms
    val texts = d.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSet).toMap
    val qids = queries.select("doc_id").collect().map(_.getLong(0))
    val b = qids.flatMap { q =>
      texts.toSeq
        .collect { case (doc, ts) if doc != q =>
          (doc, (ts & texts(q)).size) }
        .filter(_._2 > 0)
        .sortBy { case (doc, shared) => (-shared, doc) }
        .take(20).zipWithIndex
        .map { case ((doc, _), i) => (q, doc) -> (i + 1).toLong }
    }.toMap
    val expected = (a.keySet ++ b.keySet).toSeq
      .map { key =>
        val s = a.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          b.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (key._1, key._2, s)
      }
      .groupBy(_._1)
      .flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((_, doc, _), i) => (q, (i + 1).toLong, doc) }
      }.toSet
    assert(ranks(served) == expected)
    assert(ranks(served).nonEmpty)

    // a query id with no stored postings before the fence contributes
    // no terms, so no rows: odd ids live in batch 0, fence at 0 sees
    // only the even seed half
    val oddQuery = d.filter(col("doc_id") === 101).select(col("doc_id"))
    assert(PostingsStream.moreLikeThis(
      spark, s"$dir/index", oddQuery, "doc_id",
      k = 5, beforeBatch = 0).isEmpty)
    assert(!PostingsStream.moreLikeThis(
      spark, s"$dir/index", oddQuery, "doc_id", k = 5).isEmpty)
  }

  test("asOf fences walk the store's history exactly; compaction bounds them as documented") {
    import org.apache.spark.sql.functions.col
    val d = graft.Tables.table(spark, sf001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("postings-asof").toString
    val even = d.filter(col("doc_id") % 2 === 0)
    val b0 = d.filter(col("doc_id") % 4 === 1)
    val b1 = d.filter(col("doc_id") % 4 === 3)
    PostingsStream.backfillIndex(even, "doc_id", "text", dir)
    PostingsStream.appendBatch(b0, "doc_id", "text", dir, 0L)
    PostingsStream.appendBatch(b1, "doc_id", "text", dir, 1L)
    val queries = d.filter(col("doc_id") % 100 === 0)
    def servedAsOf(n: Long) = ranks(PostingsStream.bm25TopKAsOf(
      spark, dir, queries, "doc_id", "text", k = 5, asOfBatch = n,
      excludeSelf = true))
    def batchOver(corpus: org.apache.spark.sql.DataFrame) =
      ranks(TextRetrieval.bm25TopK(
        corpus, "doc_id", "text", queries, "doc_id", "text",
        k = 5, excludeSelf = true))
    // each fence reproduces the batch operator over exactly the
    // history admitted at that point — the time-travel contract
    assert(servedAsOf(-1L) == batchOver(even))
    assert(servedAsOf(0L) == batchOver(even.unionByName(b0)))
    assert(servedAsOf(1L) == batchOver(d))
    assert(servedAsOf(Long.MaxValue) == batchOver(d))
    assert(servedAsOf(-1L) != servedAsOf(1L), "fences must differ on this fixture")
    // compaction folds batch 0 into seed rows: fences ABOVE the fold
    // point stay exact, the seed fence now admits the folded rows —
    // exactly the documented exactness bound of BatchIndex.asOf
    PostingsStream.compactIndex(spark, dir, throughBatch = 0L)
    assert(servedAsOf(1L) == batchOver(d), "post-compaction fence above fold moved")
    assert(servedAsOf(-1L) == batchOver(even.unionByName(b0)),
      "folded rows must read as seed history")
  }

  test("backfillIndex refuses to clobber a store with streamed history") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("postings_guard").toString
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    PostingsStream.backfillIndex(docs, "doc_id", "text", s"$dir/index")
    PostingsStream.appendBatch(
      Seq((2L, "delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/index", 0L)
    val ex = intercept[IllegalStateException] {
      PostingsStream.backfillIndex(docs, "doc_id", "text", s"$dir/index")
    }
    assert(ex.getMessage.contains("batch=N"), ex.getMessage)
  }

  test("backfillIndex refuses a store mid-compaction: the journal is the only copy of history") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("postings_journal").toString
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    PostingsStream.backfillIndex(docs, "doc_id", "text", s"$dir/index")
    // simulate a crashed compaction's state where every batch=N dir is
    // already deleted and only the journal (+ staged rows) remain
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/index", "_compact_journal").toPath, "")
    val ex = intercept[IllegalStateException] {
      PostingsStream.backfillIndex(docs, "doc_id", "text", s"$dir/index")
    }
    assert(ex.getMessage.contains("compaction journal"), ex.getMessage)
  }

  test("document deletes: masked serve equals a corpus that never held the docs; fences compose") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.table(spark, sf001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("postings_del").toString
    val idx = s"$dir/index"
    PostingsStream.backfillIndex(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
    PostingsStream.appendBatch(
      d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
    val queries = d.filter(col("doc_id") % 100 === 0)
    val full = ranks(PostingsStream.bm25TopK(
      spark, idx, queries, "doc_id", "text", k = 5, excludeSelf = true))

    PostingsStream.deleteBatch(spark, idx,
      d.filter(col("doc_id") % 10 === 3).select(col("doc_id")),
      "doc_id", batchId = 1L)
    // masked serve: statistics re-derive from surviving postings only,
    // so the ranking equals BM25 over a corpus that never held the docs
    val masked = ranks(PostingsStream.bm25TopK(
      spark, idx, queries, "doc_id", "text", k = 5, excludeSelf = true))
    val oracle = ranks(TextRetrieval.bm25TopK(
      d.filter(col("doc_id") % 10 =!= 3), "doc_id", "text",
      queries, "doc_id", "text", k = 5, excludeSelf = true))
    assert(masked == oracle)
    assert(masked != full, "the delete set must actually move the ranking")
    // fenced BELOW the delete batch, the tombstones don't count yet
    assert(ranks(PostingsStream.bm25TopK(
      spark, idx, queries, "doc_id", "text", k = 5, excludeSelf = true,
      beforeBatch = 1L)) == full)
    // moreLikeThis is masked the same way: no deleted doc retrieved,
    // and a deleted query id sources no terms -> no rows
    val mlt = PostingsStream.moreLikeThis(
      spark, idx, queries.select(col("doc_id")), "doc_id", k = 3)
    assert(mlt.filter(col("doc_id") % 10 === 3).count() == 0)
    val deletedQuery = d.filter(col("doc_id") % 10 === 3).limit(1)
      .select(col("doc_id"))
    assert(PostingsStream.moreLikeThis(
      spark, idx, deletedQuery, "doc_id", k = 3).count() == 0)

    // streamed deletes: one tombstone batch per micro-batch, accumulated
    val in = MemoryStream[Long]
    val q = PostingsStream.deleteStreamTo(
      in.toDF().toDF("doc_id"), idx, s"$dir/delckpt", "doc_id").start()
    try {
      in.addData(2L); q.processAllAvailable()
      in.addData(4L, 2L); q.processAllAvailable()
    } finally q.stop()
    // stream batches 0,1 land beside the manual batch 1 (overwritten by
    // the stream's own batch 1) — the live set is ids from live batches
    val live = PostingsStream.liveTombstones(spark, idx)
      .collect().map(_.getLong(0)).toSet
    assert(Set(2L, 4L).subsetOf(live))
  }

  test("purgeTombstones: bytes gone, ranking equals the masked serve, crash windows resume, fsck composes") {
    val spark0 = spark
    import spark0.implicits._
    val d = graft.Tables.table(spark, sf001, "documents")
    val queries = d.filter(col("doc_id") % 100 === 0)
    val deadIds = d.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    def build(idx: String): Unit = {
      PostingsStream.backfillIndex(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
      PostingsStream.appendBatch(
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
      PostingsStream.deleteBatch(spark, idx,
        d.filter(col("doc_id") % 10 === 3).select(col("doc_id")),
        "doc_id", batchId = 1L)
    }

    // store A: clean purge — the expected end state
    val a = java.nio.file.Files.createTempDirectory("postings_purge_a").toString + "/index"
    build(a)
    val masked = ranks(PostingsStream.bm25TopK(
      spark, a, queries, "doc_id", "text", k = 5, excludeSelf = true))
    PostingsStream.purgeTombstones(spark, a)
    // tombstone store gone; only root seed files remain (fences collapsed)
    assert(!new java.io.File(s"$a/_tombstones").exists())
    assert(!new java.io.File(a).listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("batch=")))
    // the deleted ids' BYTES are gone from the stored postings
    val storedIds = spark.read.parquet(a).select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(storedIds.intersect(deadIds).isEmpty)
    // serving needs no mask and equals the masked ranking exactly
    val purged = ranks(PostingsStream.bm25TopK(
      spark, a, queries, "doc_id", "text", k = 5, excludeSelf = true))
    assert(purged == masked)
    // purge with no tombstones is a no-op
    PostingsStream.purgeTombstones(spark, a)
    assert(ranks(PostingsStream.bm25TopK(
      spark, a, queries, "doc_id", "text", k = 5, excludeSelf = true)) == masked)

    // store B: crashed at the WORST window — staging complete, journal
    // committed, deletions/promotions not yet performed
    val b = java.nio.file.Files.createTempDirectory("postings_purge_b").toString + "/index"
    build(b)
    val survivors = PostingsStream.readPostings(spark, b)
      .filter(!col("doc_id").isin(deadIds.toSeq: _*))
      .select(col("doc_id"), col("term"), col("tf"))
      .collect().toSeq // materialize BEFORE the journal blocks reads
    spark.createDataFrame(
        java.util.Arrays.asList(survivors: _*),
        PostingsStream.readPostings(spark, b).drop("batch").schema)
      .write.parquet(s"$b/_compact_tmp")
    val stagedNames = new java.io.File(s"$b/_compact_tmp").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSeq
    val rootEntries = new java.io.File(b).listFiles().map(_.getName)
    val dLines = rootEntries.filter(n =>
      n.startsWith("batch=") || n.endsWith(".parquet")).map("D " + _)
    val mLines = stagedNames.map(n => s"M $n seed-t1-$n")
    java.nio.file.Files.writeString(
      new java.io.File(b, "_compact_journal").toPath,
      (dLines ++ mLines).mkString("", "\n", "\n"))
    // reads refuse the journaled store; the next purge completes the
    // crashed swap, then executes its own (now no-op) fold and drops
    // the tombstones
    intercept[IllegalStateException] {
      PostingsStream.readPostings(spark, b).count()
    }
    PostingsStream.purgeTombstones(spark, b)
    assert(!new java.io.File(s"$b/_tombstones").exists())
    assert(ranks(PostingsStream.bm25TopK(
      spark, b, queries, "doc_id", "text", k = 5, excludeSelf = true)) == masked)

    // tombstone redelivery after a completed purge: re-delivered delete
    // batch names already-purged ids — purge again is a no-op
    PostingsStream.deleteBatch(spark, a,
      deadIds.toSeq.toDF("doc_id"), "doc_id", batchId = 1L)
    PostingsStream.purgeTombstones(spark, a)
    assert(ranks(PostingsStream.bm25TopK(
      spark, a, queries, "doc_id", "text", k = 5, excludeSelf = true)) == masked)

    // fsck composes with purge: a purged store holds no numbered
    // partitions, so verifyIndex classifies nothing and quarantine
    // moves nothing — the two maintenance paths never fight
    val dir2 = java.nio.file.Files.createTempDirectory("postings_purge_fsck").toString
    val c = s"$dir2/index"
    PostingsStream.backfillIndex(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", c)
    implicit val sqlCtx = spark.sqlContext
    val docsIn = MemoryStream[(Long, String)]
    val sq = PostingsStream.postingsStreamTo(
      docsIn.toDF().toDF("doc_id", "text"),
      "doc_id", "text", c, s"$dir2/ckpt")().start()
    try {
      val odd = d.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text").as[(Long, String)]
        .collect().toSeq
      docsIn.addData(odd: _*); sq.processAllAvailable()
    } finally sq.stop()
    PostingsStream.deleteBatch(spark, c,
      deadIds.toSeq.toDF("doc_id"), "doc_id", batchId = 1L)
    PostingsStream.purgeTombstones(spark, c)
    val check = PostingsStream.verifyIndex(spark, c, s"$dir2/ckpt")
    assert(check.committed.isEmpty && check.pending.isEmpty &&
      check.orphans.isEmpty, check.toString)
    assert(PostingsStream.quarantineIndexOrphans(spark, c, s"$dir2/ckpt").isEmpty)
    assert(ranks(PostingsStream.bm25TopK(
      spark, c, queries, "doc_id", "text", k = 5, excludeSelf = true)) == masked)
  }

  test("batch redelivery is idempotent: the q163 exactly-once contract") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("postings_replay").toString
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    PostingsStream.backfillIndex(docs, "doc_id", "text", s"$dir/index")
    val b = Seq((3L, "alpha alpha delta")).toDF("doc_id", "text")
    PostingsStream.appendBatch(b, "doc_id", "text", s"$dir/index", 0L)
    val once = spark.read.parquet(s"$dir/index")
      .orderBy("doc_id", "term").collect().map(_.toSeq).toSeq
    // crash-restart: the same batchId arrives again — the per-batch
    // directory overwrite must leave the store byte-equal, not doubled
    PostingsStream.appendBatch(b, "doc_id", "text", s"$dir/index", 0L)
    val twice = spark.read.parquet(s"$dir/index")
      .orderBy("doc_id", "term").collect().map(_.toSeq).toSeq
    assert(once == twice, "redelivered batch changed the stored postings")
    assert(once.exists(r => r.head == 3L), "batch content missing entirely")
  }
}
