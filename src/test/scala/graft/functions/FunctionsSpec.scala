package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  private def vecDf = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("id", "a", "b")
  }

  test("cosineSim: identical=1, orthogonal=0, scaled=1, zero-vector=0") {
    val out = vecDf
      .select(col("id"), VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) - 1.0) < 1e-12)
    assert(out(4L) == 0.0)
  }

  test("dotProduct and l2Norm") {
    val row = vecDf.filter(col("id") === 3)
      .select(
        VectorFunctions.dotProduct(col("a"), col("b")),
        VectorFunctions.l2Norm(col("a")))
      .collect()(0)
    assert(math.abs(row.getDouble(0) - 18.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - 3.0) < 1e-12)
  }

  test("null input propagates null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("expression survives codegen inside a filter+project pipeline") {
    // exercise the doGenCode path in a multi-operator stage
    val n = vecDf.filter(VectorFunctions.cosineSim(col("a"), col("b")) > 0.5)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(n == Set(1L, 3L))
  }
}

class RollingHashSpec extends SparkSpec {

  private def jvmRef(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))

  test("rolling_hash matches the JVM reference implementation") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "the quick brown fox", "ünïcödé")
    val out = samples.toDF("s")
      .select(col("s"), RollingHash.rollingHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(out(s) == jvmRef(s), s"mismatch for '$s'"))
  }

  test("custom expressions are SQL-callable after GraftFunctions.register") {
    graft.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("abc", Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("s", "a", "b").createOrReplaceTempView("graft_fn_test")
    val row = spark.sql(
      """SELECT rolling_hash(s) AS rh, cosine_similarity(a, b) AS cs,
        |       dot_product(a, b) AS dp, l2_norm(a) AS n
        |FROM graft_fn_test""".stripMargin).collect()(0)
    assert(row.getLong(0) == jvmRef("abc"))
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-12)

    // aggregate function registration path
    val agg = spark.sql(
      "SELECT minhash_sketch(s, 4) AS sk FROM graft_fn_test").collect()(0)
    assert(agg.getSeq[Long](0).length == 4)

    // SQ8 family: literal-array ranges, SQL == Column API
    val sq8 = spark.sql(
      """SELECT sq8_quantize(a, array(0.0D, 0.0D), array(1.0D, 1.0D)) AS qa,
        |       sq8_l2_distance(a, b, array(0.0D, 0.0D), array(1.0D, 1.0D)) AS d,
        |       int_array_l2(array(1L, 2L), array(3L, 5L)) AS il
        |FROM graft_fn_test""".stripMargin).collect()(0)
    assert(sq8.getSeq[Long](0) == Seq(255L, 0L))
    assert(sq8.getLong(1) == 0L)
    assert(sq8.getLong(2) == 13L)
  }

  test("sq8 SQL range errors name the actual cause, not '0 and 0'") {
    import spark.implicits._
    Seq(Array(1.0f, 0.0f)).toDF("a").createOrReplaceTempView("graft_sq8_err")
    def failing(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // non-literal range argument
    val nonLit = failing(
      "SELECT sq8_quantize(a, a, array(1.0D, 1.0D)) FROM graft_sq8_err")
    assert(nonLit.contains("foldable literal arrays"), nonLit)
    // NULL element inside a literal array
    val withNull = failing(
      "SELECT sq8_quantize(a, array(0.0D, NULL), array(1.0D, 1.0D)) FROM graft_sq8_err")
    assert(withNull.contains("must not contain NULL"), withNull)
    assert(withNull.contains("element 1"), withNull)
    // the well-formed shape-mismatch message still comes from the
    // expression's own type check
    val mismatch = failing(
      "SELECT sq8_quantize(a, array(0.0D), array(1.0D, 1.0D)) FROM graft_sq8_err")
    assert(mismatch.contains("equal-length"), mismatch)
  }
}

class MinHashSketchAggSpec extends SparkSpec {

  private def sketches(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Array[Long]] = {
    val sh = graft.dedup.Dedup.shingleTable(df, "doc_id", "text")
    sh.groupBy(col("doc_id"))
      .agg(MinHashSketchAgg.minhashSketch(col("g"), k).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
  }

  test("sketch: identical docs equal, near-dups agree more than disjoint docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the sleepy dog tonight"),
      (4L, "entirely different words appear in this document body")
    ).toDF("doc_id", "text")
    val sk = sketches(docs, 64)
    assert(sk(1L).sameElements(sk(2L)))
    val j13 = MinHashSketchAgg.estimateJaccard(sk(1L), sk(3L))
    val j14 = MinHashSketchAgg.estimateJaccard(sk(1L), sk(4L))
    assert(j13 > j14)
    assert(j14 == 0.0)
    // true trigram jaccard = 5/11 ≈ 0.45; k=64 estimator σ ≈ 0.06
    assert(j13 > 0.25, s"j13=$j13")
  }

  test("sketch estimate tracks true Jaccard on planted near-dups (testdata)") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val truePairs = graft.dedup.Dedup.jaccardPairs(d, "doc_id", "text", p = 1, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2).toDouble / r.getLong(3))).take(10)
    assert(truePairs.nonEmpty)
    val sk = sketches(d, 128)
    truePairs.foreach { case (a, b, jTrue) =>
      val jEst = MinHashSketchAgg.estimateJaccard(sk(a), sk(b))
      assert(math.abs(jEst - jTrue) < 0.25,
        s"pair ($a,$b): true=$jTrue est=$jEst")
    }
  }

  test("sketch survives partial aggregation + shuffle (buffer merge/serialize)") {
    val d = graft.Tables.table(spark, sf001, "documents").repartition(16)
    val sk1 = sketches(d.limit(50), 32)
    val sk2 = sketches(d.limit(50).repartition(3), 32)
    assert(sk1.keySet == sk2.keySet)
    sk1.keys.foreach(k => assert(sk1(k).sameElements(sk2(k))))
  }

  test("minhash_sketch SQL surface rejects bad k/family as analysis errors, not NPE") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    Seq("a b c").toDF("s").createOrReplaceTempView("mh_args_test")
    def analysisFails(sql: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException],
        s"expected AnalysisException, got ${e.getClass}: ${e.getMessage}")
    }
    analysisFails("SELECT minhash_sketch(s, 8, NULL) FROM mh_args_test")
    analysisFails("SELECT minhash_sketch(s, 8, 'nope') FROM mh_args_test")
    analysisFails("SELECT minhash_sketch(s, 0) FROM mh_args_test")
    analysisFails("SELECT minhash_sketch(s, 8, s) FROM mh_args_test")
    analysisFails("SELECT minhash_sketch(s, 16, 'md5chunk16') FROM mh_args_test")
  }

  test("md5chunk16 family equals the md5-chunk minhash signature (oracle family)") {
    val d = graft.Tables.table(spark, sf001, "documents").limit(100)
    val sh = graft.dedup.Dedup.shingleTable(d, "doc_id", "text")
    val viaUdaf = sh.groupBy(col("doc_id"))
      .agg(MinHashSketchAgg.minhashSketch(col("g"), 8, "md5chunk16").as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val viaSig = graft.dedup.Dedup.minhashSignature(d, "doc_id", "text", nHashes = 8)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(i => java.lang.Long.parseLong(r.getString(i), 16)).toArray).toMap
    assert(viaUdaf.keySet == viaSig.keySet)
    viaUdaf.keys.foreach(k =>
      assert(viaUdaf(k).sameElements(viaSig(k)), s"doc $k sketch mismatch"))
  }
}

class TopKAggregatorSpec extends SparkSpec {

  test("typed top-k aggregator matches window-ranked top-k (UDAF surface)") {
    import spark.implicits._
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val exactWindow = graft.similarity.Similarity
      .bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val scored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
      .join(broadcast(q.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"),
        VectorFunctions.cosineSim(col("q_vec"), col("c_vec")).as("cos"),
        col("neighbor_id"))
      .as[(Long, Double, Long)]
    val topkUdaf = new TopKAggregator(3).toColumn
    val viaAgg = scored
      .groupByKey(_._1)
      .mapValues { case (_, cos, id) => (cos, id) }
      .agg(topkUdaf.name("ids"))
      .collect()
      .flatMap { case (qid, ids) =>
        ids.zipWithIndex.map { case (id, i) => (qid, (i + 1).toLong, id) }
      }.toSet
    assert(viaAgg == exactWindow)
  }

  test("approx_count_distinct tracks exact within 5% (HLL++, §2.10)") {
    val li = graft.Tables.table(spark, sf001, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}

class TextFunctionsSpec extends SparkSpec {

  test("words/tokenCount/shingles with edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),
      (2L, "  x   y  "), // ragged whitespace
      (3L, "one two")    // fewer words than shingle width
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.shingles(col("text"), 3).as("sh"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2))).toList
    assert(out(0) == ((1L, 4, Seq("a b c", "b c d"))))
    assert(out(1)._2 == 2)
    assert(out(2)._3 == Seq.empty)
  }

  test("bpeishTokens splits letter/digit/punct runs; count bounds whitespace count") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello, world! a1b2  x"),
      (2L, "plain lowercase words")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.bpeishTokens(col("text")).as("t"),
        TextFunctions.tokenCount(col("text")).as("nw"),
        TextFunctions.bpeishTokenCount(col("text")).as("nb"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getInt(2), r.getInt(3))).toList
    assert(out(0)._2 == Seq("hello", ",", "world", "!", "a", "1", "b", "2", "x"))
    assert(out(0)._4 > out(0)._3) // punctuated text: bpe-ish exceeds whitespace
    assert(out(1)._2 == Seq("plain", "lowercase", "words"))
    assert(out(1)._3 == out(1)._4)
  }

  test("langId picks marker-dominant language, und when none or null") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of note"),
      (2L, "der hund und die katze"),
      (3L, "xyzzy plugh"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select(col("id"), TextFunctions.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "und"))
    // aggregate twin agrees on null docs
    val agg = TextAnalysis.langIdByDoc(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(agg(4L) == "und")
  }

  test("fingerprint is whitespace/case canonical") {
    import spark.implicits._
    val df = Seq(("A  B\tC", "a b c")).toDF("x", "y")
    val r = df.select(
      TextFunctions.fingerprint(col("x")),
      TextFunctions.fingerprint(col("y"))).collect()(0)
    assert(r.getString(0) == r.getString(1))
  }

  test("langIdByDoc (aggregate form) matches langId (per-row form) on real docs") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val perRow = d.select(col("doc_id"), TextFunctions.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val agg = TextAnalysis.langIdByDoc(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(agg == perRow)
  }

  test("qualityByDoc (aggregate form) matches qualityScore bit-for-bit") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val perRow = d.select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val agg = TextAnalysis.qualityByDoc(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(agg == perRow)
  }

  test("shingleTable (window form) matches per-row shingles") {
    import spark.implicits._
    val d = graft.Tables.table(spark, sf001, "documents").limit(100)
    val viaWindow = graft.dedup.Dedup.shingleTable(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaHof = d.select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), 3)).as("g")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaWindow == viaHof)
  }

  test("qualityScore is in [0,1] on real docs") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val mm = d.select(
      min(TextFunctions.qualityScore(col("text"))),
      max(TextFunctions.qualityScore(col("text")))).collect()(0)
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("redactPii replaces every occurrence of all three classes; counts agree") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c%d@ex-ample.org or x@y.io, call 212-555-0199, host 192.168.0.1"),
      (2L, "no personal data in this row at all"),
      (3L, "ip 10.0.0.7 then 172.16.254.3 and phone 415-555-0000")
    ).toDF("id", "text")
    val out = df.select(
        (col("id") +: TextFunctions.piiCounts(col("text"))) :+
          TextFunctions.redactPii(col("text")).as("red"): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((2L, 1L, 1L,
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP>")))
    assert(out(2L) == ((0L, 0L, 0L, "no personal data in this row at all")))
    assert(out(3L) == ((0L, 1L, 2L, "ip <IP> then <IP> and phone <PHONE>")))
    // null text propagates as null, not a crash
    val n = Seq((4L, null: String)).toDF("id", "text")
      .select(TextFunctions.redactPii(col("text"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("Sq8Quantize + IntArrayL2 == fused Sq8L2Distance, element-exact") {
    import spark.implicits._
    val mns = Seq(0.0, -1.0, 2.0)
    val mxs = Seq(1.0, 1.0, 2.0) // last dim degenerate span -> code 0
    val df = Seq(
      (1L, Array(0.25f, -0.5f, 2.0f), Array(0.75f, 0.5f, 2.0f)),
      (2L, Array(-9.0f, 9.0f, 2.0f), Array(1.0f, -1.0f, 2.0f)) // clamped ends
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        Sq8Quantize.sq8Quantize(col("a"), mns, mxs).as("qa"),
        Sq8Quantize.sq8Quantize(col("b"), mns, mxs).as("qb"),
        Sq8L2Distance.sq8L2(col("a"), col("b"), mns, mxs).as("fused"))
      .withColumn("viaCodes", IntArrayL2.intArrayL2(col("qa"), col("qb")))
      .collect()
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(3), s"codes path != fused for id ${r.getLong(0)}")
      assert(r.getSeq[Long](1).forall(c => c >= 0 && c <= 255))
    }
    // degenerate-span dim quantizes to 0 on both sides
    assert(out.forall(r => r.getSeq[Long](1)(2) == 0L && r.getSeq[Long](2)(2) == 0L))
  }
}
