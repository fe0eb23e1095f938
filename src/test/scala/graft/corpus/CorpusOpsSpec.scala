package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {

  test("spanTable chunks documents into consecutive word spans, order preserved") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val spans = CorpusOps.spanTable(docs, "doc_id", "text", spanWords = 4)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(spans == Map(0L -> "a b c d", 1L -> "e f g h", 2L -> "i j"))
  }

  test("spanDedup keeps the global first occurrence of each span, reassembles docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight"),  // spans: [one..four][five..eight]
      (2L, "one two three four nine ten eleven twelve"), // first span dup of doc 1's
      (3L, "five six seven eight five six seven eight")  // both spans dup (doc1 + self)
    ).toDF("doc_id", "text")
    val out = CorpusOps.spanDedup(docs, "doc_id", "text", spanWords = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("one two three four five six seven eight", 2L))
    assert(out(2L) == ("nine ten eleven twelve", 1L))
    assert(!out.contains(3L)) // every span lost to an earlier occurrence
  }

  test("decontaminate drops exactly the corpus docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta unrelated tail"),
      (2L, "totally disjoint words here now friends")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix alpha beta gamma delta suffix")
    ).toDF("doc_id", "text")
    val kept = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L)) // doc 1 shares the 4-gram "alpha beta gamma delta"
  }

  test("contaminationStats: hand-checked rates, and rate>0 iff decontaminate drops") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta unrelated tail"),      // 3 4-grams, 1 hit
      (2L, "totally disjoint words here now friends")     // 3 4-grams, 0 hits
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix alpha beta gamma delta suffix")
    ).toDF("doc_id", "text")
    val out = CorpusOps.contaminationStats(corpus, bench, "doc_id", "text", shingleN = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    // the binary policy and the fractional report agree on who is touched
    val dropped = Set(1L)
    val kept = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.filter(_._2._2 > 0).keySet == dropped && !kept.exists(dropped))
  }

  test("decontaminateRows == join-based decontaminate on real docs; works on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.table(spark, sf001, "documents")
    val corpus = d.filter(col("doc_id") % 10 =!= 7)
    val bench = d.filter(col("doc_id") % 10 === 7)
    val grams = CorpusOps.benchmarkGrams(bench, "doc_id", "text", shingleN = 4)
    val viaJoin = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaRows = CorpusOps.decontaminateRows(corpus, grams, "text", shingleN = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaRows == viaJoin)
    assert(viaRows.nonEmpty && viaRows.size < corpus.count())
    // null text keeps the row, matching the join form's no-evidence contract
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(CorpusOps.decontaminateRows(withNull, grams, "text").count() == 1)

    // the same predicate drops into a continuous stream unchanged
    val in = MemoryStream[(Long, String)]
    val out = CorpusOps.decontaminateRows(
      in.toDF().toDF("doc_id", "text"), grams, "text", shingleN = 4)
    val q = out.writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try {
      val rows = corpus.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      in.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("decon_stream")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == viaJoin)
    } finally q.stop()
  }

  test("decontaminateRows matches the join path on tab/newline-fringed text") {
    import spark.implicits._
    // Spark's tokenizer is split(trim(text), "\s+") where SQL trim strips
    // spaces ONLY and split keeps empty edge tokens — so "\talpha ..."
    // tokenizes to ["", "alpha", ...] and its 4-grams include
    // " alpha beta gamma" (leading space). The kernel must reproduce
    // exactly that, not Java String.trim semantics (which strips \t/\n
    // and would silently KEEP doc 1 here).
    val corpus = Seq(
      (1L, "\talpha beta gamma delta"), // empty edge token → shares " alpha beta gamma"
      (2L, "alpha beta gamma delta"),   // clean twin: only gram is the full 4 words
      (3L, "plain disjoint words entirely\n")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "\talpha beta gamma\n")).toDF("doc_id", "text")
    val grams = CorpusOps.benchmarkGrams(bench, "doc_id", "text", shingleN = 4)
    val viaJoin = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaRows = CorpusOps.decontaminateRows(corpus, grams, "text", shingleN = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaRows == viaJoin)
    assert(viaJoin == Set(2L, 3L))
  }

  test("repetitionStats computes exact ratios on a hand-checked doc") {
    import spark.implicits._
    // 8 words, 6 distinct ("a" x3), 7 bigrams, "a a" twice -> 6 distinct
    val docs = Seq((1L, "a a a b c d e f")).toDF("doc_id", "text")
    val r = CorpusOps.repetitionStats(docs, "doc_id", "text").collect()(0)
    assert(r.getDouble(1) == 2.0 / 8)  // dup_word_frac
    assert(r.getDouble(2) == 3.0 / 8)  // top_word_frac
    assert(r.getDouble(3) == 1.0 / 7)  // dup_2gram_frac
    assert(r.getDouble(4) == 1.0)      // mean_word_len
  }

  test("plans: q55 is a single-shuffle pipeline; q54 broadcasts the benchmark side") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.table(spark, sf001, "documents")
    // repetitionStats: the explicit doc-id repartition is the ONLY
    // exchange — (doc,word) counts, doc-level rollups, the bigram
    // window, and the final join all reuse that partitioning
    // (HashPartitioning(id) satisfies every downstream clustering).
    val p55 = CorpusOps.repetitionStats(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val ex55 = "Exchange".r.findAllIn(p55).length
    assert(ex55 == 1, s"expected 1 exchange, got $ex55 in:\n$p55")
    // decontaminate: the benchmark n-gram probe must be a broadcast
    // semi-join (corpus n-grams never shuffled)
    val p54 = CorpusOps.decontaminate(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
        "doc_id", "text", shingleN = 4)
      .queryExecution.executedPlan.toString
    assert(p54.contains("BroadcastHashJoin") && p54.contains("LeftSemi"),
      s"expected broadcast semi-join in:\n$p54")
  }

  test("vocabulary returns top-k by document frequency with term tiebreak") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "apple cherry"), (3L, "banana cherry date")
    ).toDF("doc_id", "text")
    val v = CorpusOps.vocabulary(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // df: apple 2, banana 2, cherry 2, date 1 -> top-3 by (df desc, term)
    assert(v.toSeq == Seq(("apple", 2L, 3L), ("banana", 2L, 2L), ("cherry", 2L, 2L)))
  }

  test("perSourceQuota caps each source at k, keeping the first-k by order") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val out = CorpusOps.perSourceQuota(d, "source", "doc_id", k = 2)
      .select("doc_id", "source").collect()
    val bySource = out.groupBy(_.getString(1))
    assert(bySource.values.forall(_.length <= 2))
    // kept ids per source are the minimal ones
    val all = d.select("doc_id", "source").collect().groupBy(_.getString(1))
    bySource.foreach { case (src, rows) =>
      val kept = rows.map(_.getLong(0)).sorted.toSeq
      val expect = all(src).map(_.getLong(0)).sorted.take(2).toSeq
      assert(kept == expect, s"source $src")
    }
  }

  test("removeBoilerplate drops frequent spans everywhere, keeps doc-internal repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav bar alpha beta"),   // "nav bar" df=3 -> dropped from all
      (2L, "nav bar gamma delta"),
      (3L, "nav bar epsilon zeta"),
      (4L, "foo baz foo baz")       // repeated span, df=1 -> kept twice
    ).toDF("doc_id", "text")
    val out = CorpusOps.removeBoilerplate(docs, "doc_id", "text",
        spanWords = 2, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("alpha beta", 1L))
    assert(out(2L) == ("gamma delta", 1L))
    assert(out(3L) == ("epsilon zeta", 1L))
    assert(out(4L) == ("foo baz foo baz", 2L))
    // unlike spanDedup, which would keep doc 1's "nav bar" (first
    // occurrence) and doc 4's first "foo baz" only
    val sd = CorpusOps.spanDedup(docs, "doc_id", "text", spanWords = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sd(1L) == "nav bar alpha beta")
    assert(sd(4L) == "foo baz")
  }

  test("tokenFrequencyStats hand-checked on a tiny corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = CorpusOps.tokenFrequencyStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // df: a=2 docs, b=1, c=1
    assert(out(1L) == ((3L, 2L, 1L, 2L, 5L))) // 2 occ of a (df 2) + 1 of b (df 1) -> weight 5
    assert(out(2L) == ((2L, 2L, 1L, 2L, 3L)))
  }

  test("perSourceTopK (bounded-heap UDAF) matches the rank-window formulation") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val viaUdaf = CorpusOps.perSourceTopK(d, "source", "n_chars", "doc_id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = d
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("source"), col("rank"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaUdaf == viaWindow)
    assert(viaUdaf.nonEmpty)
  }

  test("noveltyScores: dup scores 0, fresh scores 1, short doc gets NULL novelty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),   // exact dup of 1 -> novelty 0
      (3L, "zeta eta theta iota kappa"),        // all-new trigrams -> novelty 1
      (4L, "alpha beta gamma zeta eta theta"),  // mix of seen and new
      (5L, "too short")                         // < 3 tokens: zero shingles
    ).toDF("doc_id", "text")
    val out = CorpusOps.noveltyScores(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(1L) == ((3L, 0L, Some(1.0))))
    assert(out(2L) == ((3L, 3L, Some(0.0))))
    assert(out(3L) == ((3L, 0L, Some(1.0))))
    // doc 4: "alpha beta gamma" seen in doc 1 and "zeta eta theta" in
    // doc 3; the two bridging trigrams are new
    assert(out(4L) == ((4L, 2L, Some(0.5))))
    assert(out(5L) == ((0L, 0L, None)))
  }

  test("oovStats: head-vocab tokens score 0, tail tokens count as OOV") {
    import spark.implicits._
    // k=2 vocabulary by doc frequency: "aa" (df 3) and "bb" (df 2)
    val docs = Seq(
      (1L, "aa bb aa"),
      (2L, "aa bb"),
      (3L, "aa xx yy")
    ).toDF("doc_id", "text")
    val out = CorpusOps.oovStats(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(1L) == ((3L, 0L, Some(0.0))))
    assert(out(2L) == ((2L, 0L, Some(0.0))))
    assert(out(3L) == ((3L, 2L, Some(2.0 / 3.0))))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; canonical compare") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "stays the same"),
      (2L, "will change"),
      (3L, "will be removed"),
      (4L, "Canonical   FORM")
    ).toDF("k", "text")
    val newSnap = Seq(
      (1L, "stays the same"),
      (2L, "has changed"),
      (4L, "canonical form"),   // same canonical fingerprint as old
      (5L, "brand new")
    ).toDF("k", "text")
    val out = CorpusOps.snapshotDiff(oldSnap, newSnap, "k", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("snapshotDiff: NULL text classifies by key presence, not fingerprint nullness") {
    import spark.implicits._
    val nul: String = null
    val oldSnap = Seq((1L, nul), (2L, nul), (4L, "real text"))
      .toDF("k", "text")
    val newSnap = Seq((2L, nul), (3L, nul), (4L, nul))
      .toDF("k", "text")
    val out = CorpusOps.snapshotDiff(oldSnap, newSnap, "k", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "removed",    // NULL-text entity gone from new: removed, NOT added
      2L -> "unchanged",  // NULL on both sides: same (absent) content
      3L -> "added",
      4L -> "changed"))   // real text -> NULL is a content change
  }

  test("unigramSurprisal: hand-computed whole-bit self-information, exact integers") {
    val spark2 = spark
    import spark2.implicits._
    // corpus unigrams: a=4, b=1, N=5
    //   bits(a) = len(bin(5 div 4 = 1)) - 1 = 0
    //   bits(b) = len(bin(5 div 1 = 5)) - 1 = len("101") - 1 = 2
    val docs = Seq((1L, "a a a"), (2L, "a b")).toDF("doc_id", "text")
    val scored = CorpusOps.unigramSurprisal(docs, "doc_id", "text")
    // the vocabulary-bounded unigram table must ride a broadcast join —
    // a sort-merge here would shuffle the exploded token stream twice
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val got = scored.orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 0L, 0.0), (2L, 2L, 2L, 1.0)))
  }

  test("scoreAgainstUnigramBits: self-scored parity with the join form; OOV charged; stream-shaped") {
    val d = graft.Tables.table(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val bits = CorpusOps.unigramBits(d, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oov = bits.values.max + 1

    // scoring the corpus against its OWN table has no OOV -> must be
    // bit-identical to the join-based unigramSurprisal (q113/q117 gate)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(CorpusOps.scoreAgainstUnigramBits(d, "doc_id", "text", bits, oov))
      == rows(CorpusOps.unigramSurprisal(d, "doc_id", "text")))

    // unseen tokens are charged the OOV penalty per occurrence, and a
    // NULL-text row drops exactly as the join form drops it
    val spark2 = spark
    import spark2.implicits._
    val probe = Seq((1L, "zzzunseenzzz zzzunseenzzz"), (2L, null: String))
      .toDF("doc_id", "text")
    val got = rows(CorpusOps.scoreAgainstUnigramBits(probe, "doc_id", "text", bits, oov))
    assert(got == Seq((1L, 2L, 2 * oov, oov.toDouble)))
    assert(rows(CorpusOps.unigramSurprisal(probe, "doc_id", "text")).map(_._1)
      == Seq(1L))

    // a pure per-row projection: attaches to an unbounded stream as-is
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val streamed = CorpusOps.scoreAgainstUnigramBits(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", bits, oov)
    assert(streamed.isStreaming)
    // no logical Aggregate node anywhere — the fold is row-local
    assert(streamed.queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty)
  }

  test("unigramSurprisal: rarer tokens never carry fewer bits; gibberish outranks prose") {
    val d = graft.Tables.table(spark, sf001, "documents")
    // independent corpus term counts joined against the bits table —
    // the formula itself lives only in CorpusOps
    val counts = d
      .select(explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bits = CorpusOps.unigramBits(d, "doc_id", "text")
      .join(counts, Seq("term"))
      .collect().map(r => r.getAs[Long]("c") -> r.getAs[Long]("bits"))
    // self-information is antitone in count: c1 <= c2 => bits1 >= bits2
    bits.sortBy(_._1).sliding(2).foreach {
      case Array((c1, b1), (c2, b2)) =>
        assert(c1 <= c2 && b1 >= b2, s"bits not antitone: ($c1,$b1) vs ($c2,$b2)")
      case _ => ()
    }
    // and the doc score separates a common-token doc from a rare-token one
    val spark2 = spark
    import spark2.implicits._
    val probe = Seq((9000001L, "the the the the"), (9000002L, "zqxjkv wvvqz"))
      .toDF("doc_id", "text")
    val scored = CorpusOps.unigramSurprisal(
        d.select(col("doc_id"), col("text")).unionByName(probe),
        "doc_id", "text")
      .filter(col("doc_id") >= 9000001L)
      .orderBy(col("doc_id"))
      .collect().map(_.getDouble(3))
    assert(scored(0) < scored(1),
      s"common-token doc should score below gibberish: ${scored.toSeq}")
  }

  test("importanceWeights: target-like raw docs outrank off-domain ones; target rows unscored") {
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    import spark0.implicits._
    // target domain speaks {alpha beta gamma}; raw pool: one doc in
    // the target's vocabulary, one in a disjoint vocabulary
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta gamma", true),
      (10L, "alpha beta gamma beta", false),
      (11L, "zeta omega kappa zeta", false)
    ).toDF("doc_id", "text", "is_target")
    val w = CorpusOps
      .importanceWeights(docs, "doc_id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set(10L, 11L), s"only raw docs are scored: $w")
    assert(w(10L) > w(11L),
      s"target-vocabulary doc must outweigh the off-domain doc: $w")
    // weights are an exact integer sum — repeated runs are identical
    val w2 = CorpusOps
      .importanceWeights(docs.repartition(7), "doc_id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w2 == w)
  }
}
