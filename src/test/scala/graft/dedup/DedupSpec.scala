package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
      (4L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
  }

  test("exactGroups collapses exact duplicates to min id") {
    val out = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min(1,2)
  }

  test("dedupReport: within-source duplicate fractions, cross-source content not counted") {
    import spark.implicits._
    val d = Seq(
      (1L, "x", "same text"), (2L, "x", "same text"), (3L, "x", "other"),
      (4L, "y", "same text") // same content as source x: NOT a dup within y
    ).toDF("doc_id", "source", "text")
    val out = Dedup.dedupReport(d, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("x") == ((3L, 2L, 1.0 / 3.0)))
    assert(out("y") == ((1L, 1L, 0.0)))
  }

  test("minhash signatures: identical docs identical, near-dups mostly equal") {
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", nHashes = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    assert(sig(1L) == sig(2L))
    val agree13 = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    val agree14 = sig(1L).zip(sig(4L)).count { case (a, b) => a == b }
    assert(agree13 > agree14)
    assert(agree14 == 0)
  }

  test("lshCandidates surfaces exact and near dups, not disjoint docs") {
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", nHashes = 8)
    val pairs = Dedup.lshCandidates(sig, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccardPairs integer threshold finds planted near-dups in testdata") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", p = 1, q = 2).collect()
    assert(pairs.nonEmpty)
    // every pair satisfies common*2 >= uni
    assert(pairs.forall(r => r.getLong(2) * 2 >= r.getLong(3)))
  }

  test("jaccardOnCandidates = jaccardPairs restricted to LSH candidates (testdata)") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val composed = Dedup.jaccardOnCandidates(d, "doc_id", "text", p = 1, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val sig = Dedup.minhashSignature(d, "doc_id", "text", nHashes = 8)
    val cand = Dedup.lshCandidates(sig, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val groundTruth = Dedup.jaccardPairs(d, "doc_id", "text", p = 1, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      .filter(t => cand.contains((t._1, t._2)))
    assert(composed == groundTruth)
    assert(composed.nonEmpty) // planted near-dups collide in >= 1 band
  }

  test("hot buckets over maxBucket are dropped, not exploded") {
    import spark.implicits._
    // 50 docs all sharing one degenerate shingle ("a b c"), pairwise near-dups.
    val hot = (1L to 50L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val all = Dedup.jaccardPairs(hot, "doc_id", "text").count()
    assert(all == 50L * 49 / 2)
    val capped = Dedup.jaccardPairs(hot, "doc_id", "text", maxBucket = 10).count()
    assert(capped == 0) // the single hot shingle bucket is over the cap
    val sig = Dedup.minhashSignature(hot, "doc_id", "text")
    assert(Dedup.lshCandidates(sig, "doc_id", maxBucket = 10).count() == 0)
    assert(Dedup.lshCandidates(sig, "doc_id").count() == 50L * 49 / 2)
  }

  test("embeddingNearDupsBucketed caps degenerate one-bucket corpora") {
    import spark.implicits._
    // 40 near-identical vectors -> all land in ONE sign bucket and are
    // pairwise near-dups; the cap must drop the bucket, not explode it.
    val base = Array.tabulate(64)(i => 1.0f / (i + 1))
    val emb = (1L to 40L)
      .map(i => (i, base.updated(0, 1.0f + i * 1e-6f)))
      .toDF("vec_id", "embedding")
    val uncapped = Dedup.embeddingNearDupsBucketed(
      emb, "vec_id", "embedding", threshold = 0.9, nBits = 4, dim = 64)
    assert(uncapped.count() == 40L * 39 / 2)
    val capped = Dedup.embeddingNearDupsBucketed(
      emb, "vec_id", "embedding", threshold = 0.9, nBits = 4, dim = 64,
      maxBucket = 10)
    assert(capped.count() == 0)
  }

  test("sketchEstimatePairs = signature agreement count on LSH candidates (testdata)") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val est = Dedup.sketchEstimatePairs(d, "doc_id", "text", k = 8, minAgree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sig = Dedup.minhashSignature(d, "doc_id", "text", nHashes = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    val cand = Dedup.lshCandidates(
        Dedup.minhashSignature(d, "doc_id", "text", nHashes = 8), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = cand.map { case (a, b) =>
      (a, b) -> sig(a).zip(sig(b)).count { case (x, y) => x == y }.toLong
    }.filter(_._2 >= 4).toMap
    assert(est == expected)
    assert(est.nonEmpty)
  }

  test("simhash32: equal docs equal, near-dups closer in Hamming distance") {
    val sh = Dedup.simhash32(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("simhashNearDups block-partition result equals brute-force hamming filter") {
    val d = graft.Tables.table(spark, sf001, "documents").limit(200)
    val viaBlocks = Dedup.simhashNearDups(d, "doc_id", "text", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = Dedup.simhash32(d, "doc_id", "text")
    val a = sh.toDF("id_a", "sh_a")
    val b = sh.toDF("id_b", "sh_b")
    val brute = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("h"))
      .filter(col("h") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBlocks == brute)
    assert(brute.nonEmpty)
  }

  test("dedupAgainstIndex drops index-known and in-batch duplicate content") {
    import spark.implicits._
    val corpus = Seq((1L, "known content here")).toDF("doc_id", "text")
    val index = Dedup.exactGroups(corpus, "doc_id", "text").select(col("fp"))
    val newBatch = Seq(
      (10L, "known  CONTENT here"),   // canonical dup of the index entry
      (11L, "fresh words entirely"),  // keeper
      (12L, "fresh words  ENTIRELY"), // in-batch canonical dup of 11
      (13L, "another new doc")        // keeper
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstIndex(newBatch, index, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
  }

  test("q24's 0.45 threshold margin clears FP-reorder noise by orders of magnitude") {
    // the one pair-producing float threshold shared across the dedup
    // family: no pair may sit close enough to 0.45 for summation-order
    // noise to flip it between engines or between hot/cold windows.
    // The worst-case double-summation error of a 64-term dot product
    // of unit-scale values is ~64 * eps * 64 ~ 1e-12; audited min gaps
    // are 1.1e-3 (sf0.001) / 5.5e-4 (sf0.01) / 1.06e-4 (sf0.1) —
    // eight orders of magnitude of headroom at the tightest scale.
    // This pins the sf0.001 figure; re-audit all three scales in
    // DuckDB if the driver regenerates testdata.
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val minGap = e.as("a").join(e.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(abs(graft.functions.VectorFunctions.cosineSim(
        col("a.embedding"), col("b.embedding")) - lit(0.45)).as("gap"))
      .agg(min(col("gap"))).collect()(0).getDouble(0)
    assert(minGap > 1e-4, s"threshold margin collapsed to $minGap")
  }

  test("embeddingNearDupsBucketed = brute force restricted to shared sign-buckets") {
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val bucketed = Dedup.embeddingNearDupsBucketed(e, "vec_id", "embedding",
        threshold = 0.45, nBits = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bk = graft.similarity.Similarity.signBuckets(e, "vec_id", "embedding", 4, 64)
      .select(col("vec_id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = Dedup.embeddingNearDups(e, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => bk(p._1) == bk(p._2))
    assert(bucketed == brute)
    assert(bucketed.nonEmpty)
  }

  test("semanticDedup = survivors of brute force restricted to shared IVF cells (q99's contract)") {
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val kept = Dedup.semanticDedup(e, "vec_id", "embedding", threshold = 0.45, nLists = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val cellOf = graft.similarity.Similarity
      .ivfAssignCells(e, "vec_id", "embedding", nLists = 8)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val droppedExpected = Dedup.embeddingNearDups(e, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => cellOf(p._1) == cellOf(p._2))
      .map(_._2).toSet
    val allIds = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == allIds -- droppedExpected)
    assert(droppedExpected.nonEmpty, "fixture should exercise at least one in-cell drop")
  }

  test("semanticDedupKeepBest = brute-force components + best-score keeper (q110's contract)") {
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val d = graft.Tables.table(spark, sf001, "documents")
    val quality = graft.functions.TextAnalysis.qualityByDoc(d, "doc_id", "text")
      .withColumnRenamed("doc_id", "vec_id")
    val keepers = Dedup.semanticDedupKeepBest(
        e, "vec_id", "embedding", quality, "quality",
        threshold = 0.45, nLists = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force the expected components from the public pair list
    val edges = Dedup.semanticPairs(e, "vec_id", "embedding", 0.45, nLists = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val allIds = e.select("vec_id").collect().map(_.getLong(0)).toSet
    val label = scala.collection.mutable.Map(allIds.map(i => i -> i).toSeq: _*)
    def root(x: Long): Long = if (label(x) == x) x else { val r = root(label(x)); label(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (root(a), root(b))
      if (ra != rb) label(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = allIds.groupBy(root)
    val score = quality.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = comps.map { case (cid, members) =>
      (members.toSeq.sortBy(m => (-score(m), m)).head, cid)
    }.toSet
    assert(keepers == expected)
    // at least one multi-member group must pick a keeper that is NOT
    // the min id — otherwise the fixture never separates this policy
    // from plain pairwise dedup
    val multi = comps.filter(_._2.size > 1)
    assert(multi.nonEmpty)
    assert(expected.exists { case (keeper, cid) => keeper != cid },
      "fixture never exercises a best-quality keeper differing from min-id")
    // keeper count == component count (singletons included)
    assert(keepers.size == comps.size)
  }

  test("semanticDedup caps degenerate one-cell corpora instead of exploding them") {
    import spark.implicits._
    // 40 IDENTICAL vectors: equal L2 to every centroid, so the shared
    // min_by tie-break sends ALL of them to one cell; pairwise cosine 1.
    val base = Array.tabulate(64)(i => 1.0f / (i + 1))
    val emb = (1L to 40L).map(i => (i, base)).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, nLists = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L)) // min id survives the 40-clone cell
    val capped = Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, nLists = 4, maxCell = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(capped == (1L to 40L).toSet) // over-cap cell pruned, nothing drops
  }

  test("null-text contract: fingerprint ops group nulls, shingle ops drop them") {
    import spark.implicits._
    val docs = Seq(
      (1L, "real content here"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]), (4L, "other words")
    ).toDF("doc_id", "text")
    // exact dedup: null texts share a null fingerprint -> ONE group,
    // min-id keeper — null-text floods collapse instead of surviving
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(groups(None) == (2L, 2L))
    // shingle-based ops silently drop null-text docs (split(null) -> null)
    assert(Dedup.shingleTable(docs, "doc_id", "text", n = 2)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    // incremental dedup keeps null-text rows (left_anti never matches a
    // null key) — the documented contract the q49 NOT EXISTS oracle
    // mirrors; a null-tolerant index must pre-filter them upstream
    val index = Dedup.exactGroups(
      Seq((9L, "known")).toDF("doc_id", "text"), "doc_id", "text").select(col("fp"))
    val kept = Dedup.dedupAgainstIndex(docs, index, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(4L))
    assert(kept.intersect(Set(2L, 3L)).size == 1) // nulls dedup in-batch to min id
  }

  test("embeddingNearDups finds high-cosine pairs only") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dedupAgainstIndexBloom: matches the exact path on real dups and prunes the index") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val corpus = Seq(
      (0L, "alpha beta gamma"), (2L, "delta epsilon zeta"), (4L, "eta theta iota"),
      (6L, "kappa lambda mu"), (8L, "nu xi omicron")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "ALPHA   beta gamma"),     // canonical dup of indexed doc 0 -> dropped
      (3L, "fresh words here"),       // new, duplicated in-batch -> min id kept
      (5L, "fresh  WORDS here"),      // in-batch dup of 3 -> dropped
      (7L, "entirely novel content")  // new, unique -> kept
    ).toDF("doc_id", "text")
    val index = Dedup.exactGroups(corpus, "doc_id", "text").select(col("fp"))

    val exact = Dedup.dedupAgainstIndex(batch, index, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = Dedup.dedupAgainstIndexBloom(batch, index, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == Set(3L, 7L))
    assert(bloomed == exact)

    // the prune itself: every index fp the batch actually contains MUST
    // survive (no false negatives), and with 1 batch-matching fp out of
    // 5 indexed the filter should reject at least the clear misses
    val bf = batch.select(TextFunctions.fingerprint(col("text")).as("fp"))
      .stat.bloomFilter("fp", 1L << 10, 0.001)
    val pruned = index.filter(
      graft.functions.BloomMightContain.bloomMightContain(col("fp"), bf))
      .collect().map(_.getString(0)).toSet
    val mustKeep = corpus.filter(col("doc_id") === 0)
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(mustKeep.subsetOf(pruned), "bloom pruned a true member (false negative)")
    assert(pruned.size < 5, s"bloom pruned nothing: $pruned")
  }

  test("bloom probe is codegen'd and rejects non-string input at analysis") {
    import spark.implicits._
    val bf = Seq("x").toDF("s").stat.bloomFilter("s", 16, 0.01)
    val df = spark.range(10).select(
      graft.functions.BloomMightContain.bloomMightContain(
        concat(lit("v"), col("id").cast("string")), bf).as("hit"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    assert(df.collect().length == 10)
    intercept[Exception] {
      spark.range(3).select(
        graft.functions.BloomMightContain.bloomMightContain(col("id"), bf)).collect()
    }
  }

  test("containmentPairs is directional: the quote is found, Jaccard's miss is the point") {
    import spark.implicits._
    // A is fully quoted inside B (plus B's own prose), C is unrelated.
    // Jaccard(A,B) is small (union ~ B) but containment(A->B) = 1.
    val a = "alpha beta gamma delta epsilon zeta"
    val b = s"intro words here $a and a long tail of unrelated prose follows now"
    val docs = Seq((1L, a), (2L, b), (3L, "totally different content x y z w"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", p = 8, q = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"quoted doc not detected: $pairs")
    assert(!pairs.contains((2L, 1L)), "containment must be directional")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // the Jaccard-based near-dedup does NOT pair them — containment
    // covers a case Jaccard structurally cannot
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", p = 8, q = 10)
      .collect()
    assert(jac.isEmpty, s"fixture unexpectedly Jaccard-similar: ${jac.toSeq}")
  }

  test("containmentPairs df cap drops hot shingles from sizes and intersections alike") {
    import spark.implicits._
    // 'hot hot hot' shingle appears in every doc; with maxDf=2 it is
    // dropped everywhere, so doc 4 (nothing but the hot shingle left)
    // has an empty capped shingle set and can pair with nothing
    val docs = Seq(
      (1L, "hot hot hot unique one two three"),
      (2L, "hot hot hot unique one two three"),
      (3L, "hot hot hot other words appear here"),
      (4L, "hot hot hot")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        p = 8, q = 10, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 1L)), s"got $pairs")
  }
}
