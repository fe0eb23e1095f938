package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class ScaleJoinsSpec extends SparkSpec {

  test("bucketed join on the bucket key plans with no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("buckets")
    val li = Tables.table(spark, sf001, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.table(spark, sf001, "orders").select("o_orderkey", "o_totalprice")
    ScaleJoins.writeBucketed(li, "li_b", s"$tmp/li", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    ScaleJoins.writeBucketed(o, "o_b", s"$tmp/o", Seq("o_orderkey"), 8, Seq("o_orderkey"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ScaleJoins.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom-filter join pruning injects might_contain on the fact scan") {
    // Catalyst's InjectRuntimeFilter: a selective filter on the dim
    // side of a shuffle join grows a bloom filter that is pushed onto
    // the FACT side's scan — at 100 TB this is the difference between
    // shuffling the whole fact table and shuffling only rows that can
    // possibly match. Test data sits under the default thresholds'
    // radar, so pin them for the assertion window and restore.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.table(spark, sf001, "lineitem")
        .select("l_orderkey", "l_quantity")
      val o = Tables.table(spark, sf001, "orders")
        .filter(col("o_totalprice") > 100000.0) // selective dim side
        .select("o_orderkey")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter not injected on the fact side:\n$plan")
      // and it is pruning, not corrupting: result matches the plain join
      val expected = Tables.table(spark, sf001, "lineitem")
        .join(Tables.table(spark, sf001, "orders")
          .filter(col("o_totalprice") > 100000.0),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partitioned layout prunes partitions at the scan (PartitionFilters)") {
    val tmp = java.nio.file.Files.createTempDirectory("parted").toString
    Tables.table(spark, sf001, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    val pruned = spark.read.parquet(tmp)
      .filter(col("event_type") === "error").select("event_id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val expected = Tables.table(spark, sf001, "events")
      .filter(col("event_type") === "error").count()
    assert(pruned.count() == expected)
  }

  test("dynamic partition pruning injects a runtime partition filter on the fact scan") {
    import spark.implicits._
    // partitioned fact joined on its PARTITION column to a filtered
    // dim: DPP must turn the dim's filter into a runtime
    // PartitionFilter on the fact scan — at 100 TB this skips whole
    // partitions the static planner cannot prove dead. (The static
    // sibling is the PartitionFilters test above.)
    val tmp = java.nio.file.Files.createTempDirectory("dpp").toString
    Tables.table(spark, sf001, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$tmp/fact")
    // the dim must be a FILE source: a local relation's filter is
    // constant-folded away (ConvertToLocalRelation) and DPP then sees
    // no predicate on the pruning side
    Seq(("error", 1), ("click", 2), ("signup", 3)).toDF("t", "prio")
      .write.mode("overwrite").parquet(s"$tmp/dim")
    val fact = spark.read.parquet(s"$tmp/fact")
    val dim = spark.read.parquet(s"$tmp/dim")
    val joined = fact.join(dim.filter(col("prio") === 1),
      col("event_type") === col("t"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery on the fact scan:\n${plan.take(3000)}")
    val expected = Tables.table(spark, sf001, "events")
      .filter(col("event_type") === "error").count()
    assert(joined.count() == expected)
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "p"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(2))      // old file: v2 null
    assert(rows(1).getDouble(2) == 9.5)
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // skew: 5000 rows on key 1, a few on others
    val left = (Seq.fill(5000)(1) ++ Seq(2, 3, 4)).map(k => (k, s"v$k")).toDF("k", "v")
    val right = Seq((1, "dim1"), (2, "dim2"), (5, "dim5")).toDF("rk", "d")
    val plain = left.join(right, col("k") === col("rk"))
    val salted = ScaleJoins.saltedInnerJoin(left, right, "k", "rk", saltFactor = 8)
    assert(salted.count() == plain.count())
    val sd = salted.groupBy(col("k")).count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pd = plain.groupBy(col("k")).count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sd == pd)
  }

  test("salted two-phase aggregation equals the plain groupBy (q140's gate, locally)") {
    import spark.implicits._
    // one dominant key (the reduce-side hot spot), two cold keys; row
    // ids are unique so the salt actually spreads the hot key
    val rows = (0 until 5000).map(i => ("hot", i.toLong, i.toLong % 7)) ++
      Seq(("c1", 9001L, 3L), ("c1", 9002L, 4L), ("c2", 9003L, 5L))
    val df = rows.toDF("k", "rid", "x").repartition(8)
    val salted = ScaleJoins.saltedTwoPhaseAgg(df, "k", "rid", Seq("x"), 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain, s"salted=$salted plain=$plain")
    // the salt is an internal detail — it must not leak into the output
    assert(ScaleJoins.saltedTwoPhaseAgg(df, "k", "rid", Seq("x"), 16)
      .columns.toSeq == Seq("k", "n_rows", "sum_x"))
  }

  test("autoSaltedAgg: planned per-key salting equals the plain groupBy") {
    import spark.implicits._
    // hot key with 5000 rows, cold keys with a handful — the plan
    // salts ONLY the hot key, over its own factor
    val rows = (0 until 5000).map(i => ("hot", i.toLong, i.toLong % 7)) ++
      Seq(("c1", 9001L, 3L), ("c1", 9002L, 4L), ("c2", 9003L, 5L))
    val df = rows.toDF("k", "rid", "x").repartition(8)
    val plan = Seq(("hot", 16L)).toDF("k", "salt_factor")
    val auto = ScaleJoins.autoSaltedAgg(df, "k", "rid", Seq("x"), plan)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(auto == plain, s"auto=$auto plain=$plain")
    // phase one must split the hot key across its planned factor while
    // each cold key stays a SINGLE partial (salt 0): re-derive the
    // phase-one grouping and count partials per key
    val partials = df.join(broadcast(plan), Seq("k"), "left")
      .withColumn("_sf", coalesce(col("salt_factor"), lit(1L)).cast("int"))
      .groupBy(col("k"), pmod(hash(col("rid")), col("_sf")).as("_salt"))
      .count()
      .groupBy(col("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(partials("hot") == 16L, partials)
    assert(partials("c1") == 1L && partials("c2") == 1L, partials)
    // column contract matches saltedTwoPhaseAgg's
    assert(ScaleJoins.autoSaltedAgg(df, "k", "rid", Seq("x"), plan)
      .columns.toSeq == Seq("k", "n_rows", "sum_x"))
  }

  test("saltFactorPlan: only above-threshold keys appear, factors cover their rows") {
    import spark.implicits._
    // 900 hot rows over 10 cold keys of 3: total 930, nk 11 ->
    // t = 4*930 div 11 = 338; only "hot" (900 > 338) plans a factor
    val rows = Seq.fill(900)("hot") ++
      (1 to 10).flatMap(i => Seq.fill(3)(s"c$i"))
    val plan = ScaleJoins.saltFactorPlan(rows.toDF("k"), "k")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(plan.keySet == Set("hot"), plan)
    val (c, f) = plan("hot")
    assert(c == 900L)
    val t = 4L * 930L / 11L // integer threshold the planner used
    assert(f == (c + t - 1) / t, s"factor $f does not cover $c rows at $t/reducer")
  }

  test("saltFactorPlanSampled: the sample finds every hot key of the exponential fixture") {
    import spark.implicits._
    // exponential family: key i holds 2^i rows (i = 0..12) — the
    // top keys dominate, exactly the shape a sample cannot miss
    val rows = (0 to 12).flatMap(i => Seq.fill(1 << i)(s"k$i"))
    val df = rows.toDF("k").repartition(8)
    val fullHot = ScaleJoins.saltFactorPlan(df, "k")
      .collect().map(_.getString(0)).toSet
    assert(fullHot.nonEmpty)
    val sampled = ScaleJoins.saltFactorPlanSampled(df, "k", fraction = 0.25, seed = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // every key the FULL census flags must be flagged by the sample,
    // with a usable (positive) factor
    fullHot.foreach { k =>
      assert(sampled.contains(k), s"sampled plan missed hot key $k: $sampled")
      assert(sampled(k) >= 1L, s"non-positive sampled factor for $k: $sampled")
    }
    // and the sampled plan never flags a key the full census shows
    // BELOW half the threshold (boundary wobble allowed, cold keys not)
    val counts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = 4L * rows.size / 13L
    sampled.keys.foreach { k =>
      assert(counts(k) * 2 > t, s"sampled plan flagged cold key $k (count ${counts(k)}, t $t)")
    }
    // factor-independence: the sampled plan drives the same exact agg
    val withId = rows.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "rid")
    val plan = ScaleJoins.saltFactorPlanSampled(withId, "k", 0.25, 7L)
    val auto = ScaleJoins.autoSaltedAgg(withId, "k", "rid", Seq("rid"), plan)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = withId.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("rid")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(auto == plain)
  }

  test("autoSaltedJoin: planned per-key replication equals the plain join") {
    import spark.implicits._
    val fact = ((0 until 4000).map(i => ("hot", i.toLong)) ++
      Seq(("c1", 9001L), ("c1", 9002L), ("c2", 9003L))).toDF("k", "payload")
    val dim = Seq(("hot", "H"), ("c1", "X"), ("c2", "Y"), ("unmatched", "Z"))
      .toDF("dk", "name")
    val plan = Seq(("hot", 8L)).toDF("k", "salt_factor")
    val auto = ScaleJoins.autoSaltedJoin(fact, dim, "k", "dk", plan)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(auto.columns.toSeq == plain.columns.toSeq)
    assert(auto.orderBy("payload").collect().map(_.toSeq).toSeq ==
      plain.orderBy("payload").collect().map(_.toSeq).toSeq)
    // replication is bounded by the PLAN: hot dim row 8 copies, cold 1 —
    // a global factor 8 would have made 8 copies of every dim row
    val replicated = dim
      .join(broadcast(plan), col("dk") === col("k"), "left")
      .withColumn("_sf", coalesce(col("salt_factor"), lit(1L)))
    assert(replicated.agg(sum(col("_sf"))).collect()(0).getLong(0) == 11L)
  }

  test("salted joins carry only DETERMINISTIC expressions (shuffle-retry safety)") {
    import spark.implicits._
    // a map task recomputed after a fetch failure must re-emit every
    // row with the SAME salt as the copies some reducers already
    // consumed — any nondeterministic expression (partition-dependent
    // row ids, rand) in the salted plan is the classic duplicate/
    // lost-row hazard. Single-host tests cannot catch the corruption
    // itself; this gate catches the expression class that causes it.
    val fact = Seq(("hot", 1L), ("hot", 2L), ("c1", 3L)).toDF("k", "payload")
    val dim = Seq(("hot", "H"), ("c1", "X")).toDF("dk", "name")
    val plan = Seq(("hot", 8L)).toDF("k", "salt_factor")
    for (df <- Seq(
        ScaleJoins.saltedInnerJoin(fact, dim, "k", "dk", saltFactor = 8),
        ScaleJoins.autoSaltedJoin(fact, dim, "k", "dk", plan),
        ScaleJoins.autoSaltedAgg(fact, "k", "payload", Seq("payload"), plan))) {
      val nondet = df.queryExecution.analyzed.collect {
        case p => p.expressions.flatMap(e => e.collect {
          case x if !x.deterministic => x
        })
      }.flatten
      assert(nondet.isEmpty, s"nondeterministic exprs in salted plan: $nondet")
    }
  }

  test("salted join salts identically under different input partitionings") {
    import spark.implicits._
    // the determinism contract, observed end-to-end: the same rows in
    // a different partition layout must land on the same (key, salt)
    // reducer buckets
    val left = ((0 until 2000).map(i => (1, i)) ++ Seq((2, 9001), (3, 9002)))
      .toDF("k", "v")
    val right = Seq((1, "a"), (2, "b"), (3, "c")).toDF("rk", "d")
    def saltHistogram(l: org.apache.spark.sql.DataFrame) =
      l.withColumn("_salt", pmod(hash(col("k"), col("v")).cast("long"), lit(8L)))
        .groupBy("k", "_salt").count()
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(saltHistogram(left.repartition(3)) == saltHistogram(left.repartition(17)))
    // and the joined result is still exactly the plain join either way
    val plain = left.join(right, col("k") === col("rk")).orderBy("v", "rk")
      .collect().map(_.toSeq).toSeq
    for (parts <- Seq(3, 17)) {
      val got = ScaleJoins
        .saltedInnerJoin(left.repartition(parts), right, "k", "rk", saltFactor = 8)
        .orderBy("v", "rk").collect().map(_.toSeq).toSeq
      assert(got == plain)
    }
  }

  test("autoSaltedJoin: a non-positive planned factor fails loudly") {
    import spark.implicits._
    val fact = Seq(("a", 1L)).toDF("k", "payload")
    val dim = Seq(("a", "A")).toDF("dk", "name")
    val plan = Seq(("a", -2L)).toDF("k", "salt_factor")
    val e = intercept[Exception] {
      ScaleJoins.autoSaltedJoin(fact, dim, "k", "dk", plan).collect()
    }
    assert(e.getMessage.contains("non-positive salt factor"), e.getMessage)
  }

  test("autoSaltedAgg: an EMPTY plan (no hot keys) degrades to the plain shape") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), ("b", 2L, 3L), ("a", 3L, 4L))
      .toDF("k", "rid", "x")
    val plan = Seq.empty[(String, Long)].toDF("k", "salt_factor")
    val got = ScaleJoins.autoSaltedAgg(df, "k", "rid", Seq("x"), plan)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> (2L, 6L), "b" -> (1L, 3L)))
  }

  test("autoSaltedAgg: a non-positive planned factor fails loudly") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L)).toDF("k", "rid", "x")
    val plan = Seq(("a", 0L)).toDF("k", "salt_factor")
    val e = intercept[Exception] {
      ScaleJoins.autoSaltedAgg(df, "k", "rid", Seq("x"), plan).collect()
    }
    assert(e.getMessage.contains("non-positive salt factor"), e.getMessage)
  }

  test("bloomPrunedJoin: identical to the plain join, and the probe actually prunes") {
    val spark0 = spark
    import spark0.implicits._
    val big = (1L to 5000L).map(i => (i % 100, i)).toDF("k", "payload")
    val small = Seq(3L, 7L, 42L).map(k => (k, s"dim$k")).toDF("sk", "name")
    val joined = ScaleJoins.bloomPrunedJoin(big, small, "k", "sk",
      expectedKeys = 100L)
    val plain = big.join(small, col("k") === col("sk"))
    assert(joined.orderBy("payload").collect().map(_.toSeq).toSeq ==
      plain.orderBy("payload").collect().map(_.toSeq).toSeq)
    // the filter must prune most of the big side before the join
    val bf = small.stat.bloomFilter(col("sk").cast("string"), 100L, 0.01)
    val kept = big.filter(graft.functions.BloomMightContain
      .bloomMightContain(col("k").cast("string"), bf)).count()
    assert(kept < 500L, s"3 of 100 keys should keep ~150 rows, kept $kept")
  }

  test("bloomPrunedJoin: a lying fpp (worst-case false positives) still changes nothing") {
    val spark0 = spark
    import spark0.implicits._
    val big = (1L to 500L).map(i => (i, i * 10)).toDF("k", "payload")
    val small = Seq((1L, "a"), (499L, "b")).toDF("sk", "name")
    // absurdly high fpp -> tiny filter -> many false positives; the
    // exact join must still drop every one of them
    val joined = ScaleJoins.bloomPrunedJoin(big, small, "k", "sk",
      expectedKeys = 2L, fpp = 0.5)
    assert(joined.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 499L))
  }

  test("bloomPrunedJoin: an EMPTY dim yields an empty join, not an NPE") {
    val spark0 = spark
    import spark0.implicits._
    val big = (1L to 10L).map(i => (i, i)).toDF("k", "payload")
    val small = Seq.empty[(Long, String)].toDF("sk", "name")
    // Spark's stat.bloomFilter NPEs on a zero-row frame; the operator
    // must guard (an empty dim is a legal runtime state, e.g. a
    // selective filter matching nothing at small scale)
    assert(ScaleJoins.bloomPrunedJoin(big, small, "k", "sk", 10L).count() == 0L)
  }

  test("AQE splits a skewed sort-merge join partition (OptimizeSkewedJoin)") {
    // an ISOLATED child session (shared SparkContext, own SQLConf) so
    // the aggressive skew thresholds never leak into other suites
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    // one hot key owning ~90% of the fact side. The payload must be
    // INCOMPRESSIBLE (hashed, row-unique): skew detection reads the
    // COMPRESSED map-output sizes, and a constant string deflates to
    // nearly nothing, hiding the skew from the threshold
    val md = java.security.MessageDigest.getInstance("MD5")
    val fact = (1 to 60000).map { i =>
      val k = if (i % 10 != 0) 1L else (i % 500).toLong
      val h = md.digest(java.nio.ByteBuffer.allocate(4).putInt(i).array())
        .map("%02x".format(_)).mkString
      (k, h * 4)
    }.toDF("k", "payload")
    val dim = (0L to 500L).map(k => (k, s"name$k")).toDF("dk", "name")
    val joined = fact.join(dim, col("k") === col("dk"))
    // execute THIS DataFrame's own plan (a .count() spawns a separate
    // QueryExecution and would leave this one un-finalized)
    val n = joined.queryExecution.toRdd.count()
    assert(n == 60000L)
    // the ADAPTIVE final plan must carry the skew=true SMJ marker —
    // proof the hot partition was split instead of landing on one task
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"skew join did not engage; plan:\n${plan.take(2000)}")
  }
}
