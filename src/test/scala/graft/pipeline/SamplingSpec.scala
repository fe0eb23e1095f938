package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("withSplit is partition-invariant and roughly the requested fraction") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val a = Sampling.withSplit(d, "doc_id", 0.2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.withSplit(d.repartition(7), "doc_id", 0.2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // assignment follows from the id, not the layout
    val testFrac = a.values.count(_ == "test").toDouble / a.size
    assert(testFrac > 0.1 && testFrac < 0.3, s"test fraction $testFrac")
  }

  test("mixSources tags each source and respects per-source rates") {
    import spark.implicits._
    val a = (1L to 200L).toDF("id")
    val b = (201L to 400L).toDF("id")
    val mixed = Sampling.mixSources(Seq(("a", a, 1.0), ("b", b, 0.0)), "id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(mixed.length == 200 && mixed.forall(_._2 == "a"))
    val half = Sampling.mixSources(Seq(("a", a, 0.5), ("b", b, 0.5)), "id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byTag = half.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byTag.keySet == Set("a", "b"))
    assert(byTag.values.forall(n => n > 60 && n < 140)) // ~100 each
  }

  test("edge fractions: 0.0 selects nothing, 1.0 selects everything") {
    import spark.implicits._
    val d = (1L to 100L).toDF("id")
    assert(d.filter(Sampling.inSlice("t", col("id"), 0.0)).count() == 0)
    assert(d.filter(Sampling.inSlice("t", col("id"), 1.0)).count() == 100)
  }

  test("split and mixture selections are independent, not nested") {
    import spark.implicits._
    // With an unsalted shared hash, a rate-0.2 mixture slice would be
    // EXACTLY the testFrac=0.2 test split (100% overlap), and a rate-0.5
    // slice would fully contain it. Salting per purpose makes the
    // selections independent: overlap ~= product of fractions.
    val n = 10000L
    val d = (1L to n).toDF("id")
    val split = Sampling.withSplit(d, "id", testFrac = 0.2)
    val test = split.filter(col("split") === "test")
    val testN = test.count().toDouble
    val slice = Sampling.mixSources(Seq(("src", d, 0.2)), "id")
    val sliceN = slice.count().toDouble
    val overlap = test.join(slice, "id").count().toDouble
    // expected overlap = testN * sliceN / n (independent); nested would
    // give overlap == min(testN, sliceN)
    val expected = testN * sliceN / n
    assert(overlap > expected * 0.6 && overlap < expected * 1.4,
      s"overlap $overlap vs independent-expected $expected (nested would be ${math.min(testN, sliceN)})")
    assert(overlap < math.min(testN, sliceN) * 0.5,
      "overlap looks nested: mixture slice contains/is contained by the test split")

    // two mixture sources over the SAME keyspace also draw independent
    // slices (salted by source name)
    val s1 = Sampling.mixSources(Seq(("a", d, 0.3)), "id").select("id")
    val s2 = Sampling.mixSources(Seq(("b", d, 0.3)), "id").select("id")
    val both = s1.join(s2, "id").count().toDouble
    val exp2 = s1.count().toDouble * s2.count().toDouble / n
    assert(both > exp2 * 0.6 && both < exp2 * 1.4,
      s"source-slice overlap $both vs independent-expected $exp2")
  }

  test("stratifiedSample: per-stratum rates, rate-1 whole stratum, partition-invariant") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val rates = Map("en" -> 0.25, "de" -> 1.0, "fr" -> 0.5)
    val out = Sampling.stratifiedSample(d, "doc_id", "lang", rates, defaultRate = 0.1)
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = d.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(byLang("de") == totals("de"), "rate 1.0 must keep the whole stratum")
    val enFrac = byLang("en").toDouble / totals("en")
    assert(enFrac > 0.10 && enFrac < 0.45, s"en frac $enFrac far from 0.25")
    val frFrac = byLang("fr").toDouble / totals("fr")
    assert(frFrac > 0.30 && frFrac < 0.70, s"fr frac $frFrac far from 0.5")

    // default rate 0.0 drops unlisted strata entirely
    val strict = Sampling.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0)
    assert(strict.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))

    // the selection is a pure function of (stratum, id): repartitioning
    // does not move it
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(
        d.repartition(7), "doc_id", "lang", rates, defaultRate = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
  }

  test("uniformPerGroup: exactly k per group, rerun- and partition-invariant, salt-sensitive") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val s1 = Sampling.uniformPerGroup(d, "source", "doc_id", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val perGroup = Sampling.uniformPerGroup(d, "source", "doc_id", k = 10)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 10))
    val s2 = Sampling.uniformPerGroup(d.repartition(7), "source", "doc_id", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val other = Sampling.uniformPerGroup(d, "source", "doc_id", k = 10, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 != other) // a different salt draws a different sample
  }

  test("sampleToTokenBudget: within one doc of budget per source, partition-invariant") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.table(spark, sf001, "documents")
    val budget = 2000L
    val out = Sampling.sampleToTokenBudget(d, "doc_id", "text", "source", budget)
    val perSource = out.groupBy("source")
      .agg(sum("n_tokens").as("total"), min("n_tokens").as("mn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, total, mn) =>
      // every kept doc's predecessor-sum was under budget, so the total
      // exceeds the budget by LESS than the last doc's own size; with
      // the min size as a conservative bound: total - budget < max doc,
      // and removing any kept doc would land under budget + its size
      assert(total < budget + d.filter(col("source") === src)
        .select(max(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")))
        .collect()(0).getLong(0), s"$src over budget by a whole doc")
      assert(mn >= 0)
    }
    // sources with fewer total tokens than the budget keep everything
    val totals = d.groupBy("source")
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptCounts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val allCounts = d.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.filter(_._2 <= budget).keys.foreach { src =>
      assert(keptCounts(src) == allCounts(src), s"$src truncated under budget")
    }
    // deterministic under repartitioning
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sampleToTokenBudget(
        d.repartition(7), "doc_id", "text", "source", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
    // a frame already carrying its own token accounting is refused, not
    // silently recounted
    val ex = intercept[IllegalArgumentException] {
      Sampling.sampleToTokenBudget(
        out, "doc_id", "text", "source", budget) // `out` has n_tokens
    }
    assert(ex.getMessage.contains("n_tokens"), ex.getMessage)
  }

  test("cluster-safe split: no verified near-dup pair ever straddles train/test") {
    import org.apache.spark.sql.functions.col
    val d = graft.Tables.table(spark, sf001, "documents")
    val edges = graft.dedup.Dedup
      .jaccardOnCandidates(d, "doc_id", "text", p = 1, q = 2)
    val cc = graft.dedup.Clusters.connectedComponents(
      d.select(col("doc_id")), "doc_id", edges)
    val split = Sampling.withSplit(cc, "cluster_id", testFrac = 0.2)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "test premise: some near-dup pairs exist at sf0.001")
    val leaked = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(leaked.isEmpty, s"near-dup pairs straddle the split: ${leaked.take(5)}")
    // and both sides are populated — the split still splits
    assert(split.values.toSet == Set("train", "test"))
  }

  test("curriculum schedule: stages are quality-ordered per shard, positions contiguous") {
    import org.apache.spark.sql.functions.col
    val d = graft.Tables.table(spark, sf001, "documents")
    val q = graft.functions.TextAnalysis.qualityByDoc(d, "doc_id", "text")
    val sched = Sampling.curriculumSchedule(q, "doc_id", "quality",
        nStages = 4, nShards = 8)
      .select(col("doc_id"), col("quality"), col("shard"), col("stage"), col("pos"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sched.map(_._3).distinct.forall(s => s >= 0 && s < 8))
    sched.groupBy(_._3).foreach { case (shard, rows) =>
      // ntile respects the (quality desc) order: every doc in stage s
      // has quality >= every doc in stage s+1 (ties broken by id stay
      // within the ordering contract)
      val byStage = rows.groupBy(_._4)
      val stages = byStage.keys.toSeq.sorted
      assert(stages.head == 1 && stages == (1L to stages.size).toSeq)
      stages.sliding(2).foreach {
        case Seq(a, b) =>
          assert(byStage(a).map(_._2).min >= byStage(b).map(_._2).max - 1e-12,
            s"shard $shard: stage $a not uniformly easier than $b")
        case _ =>
      }
      // positions contiguous 1..k within each (shard, stage)
      byStage.foreach { case (_, ss) =>
        assert(ss.map(_._5).sorted.toSeq == (1L to ss.size).toSeq)
      }
    }
  }

  test("temperature quotas: head source pinned to budget, tail boosted, monotone") {
    import org.apache.spark.sql.functions.col
    val d = graft.Tables.table(spark, sf001, "documents")
    val rows = Sampling.temperatureQuotas(d, "source", budget = 1000L)
      .select(col("source"), col("n_docs"), col("quota"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mx = rows.maxBy(_._2)
    assert(mx._3 == 1000L, s"largest source must get the full budget: $mx")
    // monotone in size, and flattening: per-doc rate rises as size falls
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, n1, q1), (_, n2, q2)) =>
        assert(q1 <= q2 || n1 == n2)
        assert(q1.toDouble / n1 >= q2.toDouble / n2 - 1e-12,
          "temperature must boost the tail's per-doc rate")
      case _ =>
    }
  }
}
