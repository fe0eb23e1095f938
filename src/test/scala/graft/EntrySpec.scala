package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: every registered query runs at sf0.001, entry
  * returns rows, and the oracle map stays consistent with the registry. */
class EntrySpec extends SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys; SQL is single-line") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(SparkEntry.oracleSql.values.forall(s => !s.contains("\n")))
  }

  test("every registered query executes and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      // driver-compare lint: duplicate/empty column names would break
      // the sort-columns-by-name hash compare silently
      val cols = df.columns.toSeq
      assert(cols.nonEmpty && cols.forall(_.nonEmpty) &&
        cols.distinct.size == cols.size,
        s"$name has duplicate/empty output columns: $cols")
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}

/** Property-based invariants (SURVEY.md §5.4), via ScalaCheck's own
  * runner (no scalatestplus bridge in the offline dependency set). */
class PropertySpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  lazy val spark = GraftSession.local("graft-props")

  private def check(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("base64 encode/decode identity (P5 parity)") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(20, Gen.alphaNumStr.suchThat(_.nonEmpty))) {
      xs: List[String] =>
        val out = xs.toDF("s")
          .selectExpr("CAST(unbase64(base64(CAST(s AS BINARY))) AS STRING) AS r")
          .collect().map(_.getString(0)).toList
        out == xs
    })
  }

  test("split(birthDay,'-')[0] equals substring year for ISO dates (P6)") {
    import spark.implicits._
    val dateGen = for {
      y <- Gen.choose(1900, 2100); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d"
    check(Prop.forAll(Gen.listOfN(30, dateGen)) { ds: List[String] =>
      val out = ds.toDF("birthDay").selectExpr(
        "split(birthDay, '-')[0] AS a", "substring(birthDay, 1, 4) AS b").collect()
      out.forall(r => r.getString(0) == r.getString(1))
    })
  }

  test("spanDedup invariants: reassembly identity without dups, span conservation with them") {
    import spark.implicits._
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, wordGen))
    check(Prop.forAll(Gen.listOfN(6, docGen)) { texts: List[List[String]] =>
      val docs = texts.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      // span conservation: total surviving spans across all docs equals
      // the number of DISTINCT spans in the corpus (each distinct span
      // survives exactly once, at its global first occurrence)
      val allSpans = texts.flatMap(_.grouped(4).map(_.mkString(" ")))
      val keptCount = graft.corpus.CorpusOps
        .spanDedup(docs, "doc_id", "text", spanWords = 4)
        .agg(org.apache.spark.sql.functions.sum("n_spans")).collect()(0).getLong(0)
      keptCount == allSpans.distinct.size
    }, n = 5)
  }

  test("shingle_overlap_set membership == the SQL shingles twin on mixed-whitespace text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // every Java-regex \s char PLUS U+00A0 NBSP (which \s does NOT
    // match — both sides must agree it is a word character): the exact
    // fringe where the round-5 kernel/SQL divergence lived
    val wsGen = Gen.chooseNum(1, 3).flatMap(k => Gen.listOfN(k,
      Gen.oneOf(' ', '\t', '\n', '\r', '\u000b', '\f', '\u00a0'))).map(_.mkString)
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val textGen = for {
      lead <- Gen.option(wsGen)
      k <- Gen.chooseNum(0, 8)
      words <- Gen.listOfN(k, wordGen)
      seps <- Gen.listOfN(math.max(k - 1, 0), wsGen)
      trail <- Gen.option(wsGen)
    } yield lead.getOrElse("") +
      words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString +
      trail.getOrElse("")
    val gramGen = Gen.listOfN(3, wordGen).map(_.mkString(" "))
    check(Prop.forAll(
      Gen.listOfN(8, textGen), Gen.nonEmptyListOf(gramGen)) { (texts, grams) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val out = df.select(
        graft.functions.ShingleOverlapSet
          .shingleOverlapSet(col("text"), 3, grams.distinct).as("kernel"),
        arrays_overlap(
          graft.functions.TextFunctions.shingles(col("text"), 3),
          array(grams.distinct.map(lit): _*)).as("sql")
      ).collect()
      out.forall(r => !r.isNullAt(1) && r.getBoolean(0) == r.getBoolean(1))
    }, n = 25)
  }

  test("funnel reach is monotone: counts never increase with step index") {
    import spark.implicits._
    val evGen = for {
      u <- Gen.choose(1L, 5L); t <- Gen.choose(0L, 1000L)
      e <- Gen.oneOf("view", "click", "purchase")
    } yield (u, new java.sql.Timestamp(t * 1000), e)
    check(Prop.forAll(Gen.listOfN(40, evGen)) { evs: List[(Long, java.sql.Timestamp, String)] =>
      val df = evs.toDF("user_id", "ts", "event_type")
      val c = graft.operators.Funnel
        .counts(df, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      c(1L) >= c(2L) && c(2L) >= c(3L)
    }, n = 5)
  }

  test("join row-count invariant: |A join B on key| <= |A| * max-multiplicity(B)") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(30, Gen.choose(0, 9)), Gen.listOfN(30, Gen.choose(0, 9))) {
      (as: List[Int], bs: List[Int]) =>
        val joined = as.toDF("k").join(bs.toDF("k"), "k").count()
        val maxMult = bs.groupBy(identity).map(_._2.size).maxOption.getOrElse(0)
        joined <= as.size.toLong * maxMult
    }, n = 5)
  }

  test("bm25TopK vs a plain-Scala reference: candidate set exact, top-1 agrees under margin") {
    import spark.implicits._
    val wordGen = Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, wordGen))
    check(Prop.forAll(Gen.listOfN(6, docGen), docGen) {
      (texts: List[List[String]], qWords: List[String]) =>
        val docs = texts.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        val queries = Seq((1000L, qWords.mkString(" ")))
        val out = graft.corpus.TextRetrieval.bm25TopK(
            docs.toDF("doc_id", "text"), "doc_id", "text",
            queries.toDF("doc_id", "text"), "doc_id", "text",
            k = docs.size)
          .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)

        // reference, straight from the formula
        val tf = docs.flatMap { case (id, t) =>
          t.split("\\s+").groupBy(identity).map { case (w, g) => (id, w, g.length.toLong) } }
        val len = tf.groupBy(_._1).map { case (id, rows) => id -> rows.map(_._3).sum }
        val n = len.size
        val avgdl = if (n == 0) 1.0 else len.values.sum.toDouble / n
        val df = tf.groupBy(_._2).map { case (w, rows) => w -> rows.size }
        val qTerms = qWords.distinct.toSet
        val scores = docs.flatMap { case (id, _) =>
          val contribs = tf.filter(r => r._1 == id && qTerms(r._2)).map { case (_, w, f) =>
            math.log(1.0 + (n - df(w) + 0.5) / (df(w) + 0.5)) *
              f * (1.2 + 1.0) / (f + 1.2 * (1.0 - 0.75 + 0.75 * len(id) / avgdl))
          }
          if (contribs.isEmpty) None else Some(id -> contribs.sum)
        }

        // candidate SET is exact: every doc sharing a query term, no other
        val setOk = out.map(_._2).toSet == scores.map(_._1).toSet
        // top-1 agrees whenever the reference margin is clearly above
        // double summation-order noise
        val top1Ok = scores.sortBy(t => (-t._2, t._1)) match {
          case (d1, s1) :: (_, s2) :: _ if s1 - s2 > 1e-9 =>
            out.headOption.exists(_._2 == d1)
          case (d1, _) :: Nil => out.headOption.exists(_._2 == d1)
          case _ => true
        }
        setOk && top1Ok
    }, n = 10)
  }
}
