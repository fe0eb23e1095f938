package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Join-at-scale techniques (builder prompt: bucketing for co-located
  * joins, salting for skew). These are the 100 TB plays the relational
  * queries rely on implicitly via AQE; here they are explicit, testable
  * operators.
  */
object ScaleJoins {

  /** Write `df` as a bucketed (and optionally sorted) external table:
    * both sides of a join bucketed by the join key with the same bucket
    * count read back with compatible HashPartitioning, so the join plans
    * with NO exchange — at 100 TB this converts the biggest fact-fact
    * shuffle into a local zip of pre-shuffled files. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** Co-located inner join of two bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))

  /** Salted inner equi-join for skewed keys: each left row gets a salt
    * in [0, saltFactor); the (small-ish) right side is replicated once
    * per salt value, so a hot key's rows spread over `saltFactor`
    * reducers instead of one. Result is identical to the plain join.
    * (AQE's skewJoin does this adaptively for sort-merge joins; the
    * explicit form also covers aggregation-free pipelines and fixed
    * plans.)
    *
    * The salt is DETERMINISTIC — `pmod(hash(saltCols...), factor)`,
    * with `saltCols` defaulting to every left column: on a real
    * cluster a map task recomputed after a fetch failure must re-emit
    * each row with the SAME salt (= same reducer) as the copies some
    * reducers already consumed, or the retry duplicates/loses rows.
    * A nondeterministic salt source (partition-dependent row ids)
    * passes every single-host test and corrupts exactly in the
    * large-cluster retry regime this operator exists for. Pass a
    * high-cardinality `saltCols` (a row id) when the data has one —
    * hashing all columns spreads duplicates of the SAME row onto the
    * same reducer, which only matters for duplicate-dominated keys. */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    val src = (if (saltCols.nonEmpty) saltCols else left.columns.toSeq).map(col)
    val saltedLeft = left.withColumn(
      "_salt", pmod(hash(src: _*).cast("long"), lit(saltFactor.toLong)))
    val explodedRight = right.withColumn(
      "_salt", explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey) &&
          saltedLeft("_salt") === explodedRight("_salt"))
      .drop("_salt")
  }

  /** Two-phase SALTED aggregation for skewed group keys: phase one
    * aggregates on (key, salt) — the hot key's rows land on
    * `saltFactor` reducers instead of one — phase two folds the
    * `saltFactor` partials per key into the final row. Correct for any
    * commutative-associative aggregate expressed as (partial, merge)
    * pairs; here the universally-reusable pair (COUNT via SUM of
    * partial counts, SUM via SUM of partial sums). The salt must be
    * derived from a HIGH-CARDINALITY column (a row id), never the
    * group key — salting on the key would put every copy of the hot
    * key back on one reducer. Result is identical to the plain
    * `groupBy(key)`: that identity is the q140 oracle gate. (Spark's
    * own hash aggregate already does map-side partials; the explicit
    * salted form ADDITIONALLY splits the reduce side, which matters
    * when one key dominates entire partitions at 100 TB.) */
  def saltedTwoPhaseAgg(
      df: DataFrame, groupKey: String, saltCol: String,
      sumCols: Seq[String], saltFactor: Int): DataFrame = {
    val partial = df
      .groupBy(col(groupKey), pmod(hash(col(saltCol)), lit(saltFactor)).as("_salt"))
      .agg(count(lit(1)).as("_pn"),
        sumCols.map(c => sum(col(c)).as(s"_ps_$c")): _*)
    partial.groupBy(col(groupKey))
      .agg(sum(col("_pn")).as("n_rows"),
        sumCols.map(c => sum(col(s"_ps_$c")).as(s"sum_$c")): _*)
  }

  /** Per-key salt-factor PLAN (the q185 planner as a reusable
    * operator): over `df`'s `keyCol`, every key whose row count
    * exceeds `hotMultiple`x the mean gets `salt_factor = ceil(c/t)` —
    * how many shuffle buckets its rows must spread over so no reducer
    * holds more than the threshold. Output is |hot-keys|-sized
    * (`k`, `c`, `salt_factor`), the exact input [[autoSaltedAgg]] and
    * [[autoSaltedJoin]] consume; all arithmetic is integer
    * ceiling-division, the threshold a broadcast scalar. */
  def saltFactorPlan(
      df: DataFrame, keyCol: String, hotMultiple: Int = 4): DataFrame = {
    val c = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
    val s = c.agg(sum(col("c")).as("total"), count(lit(1)).as("nk"))
    c.crossJoin(broadcast(s))
      .withColumn("t", expr(s"($hotMultiple * total) div nk"))
      .filter(col("c") > col("t"))
      .select(col("k"), col("c"), expr("(c + t - 1) div t").as("salt_factor"))
  }

  /** SAMPLED salt-factor plan — [[saltFactorPlan]] from a
    * deterministic row sample instead of a full census. The full
    * planner is itself a groupBy over EVERY row: at 100 TB the
    * planning pass is as expensive as the shuffle it is trying to
    * protect. Hot keys are by definition the keys a row sample
    * cannot miss — a key holding k% of the input lands ~k% of any
    * sample — so planning from `fraction` of the rows with counts
    * scaled by 1/fraction finds the same hot keys at 1/fraction the
    * cost. Counts scale via ceil(count/fraction), so a sampled hot
    * key never under-plans its factor by truncation. Bias note: keys
    * BELOW the sample's resolution (expected sampled rows ~ 1) are
    * invisible, which (a) cannot matter — they are orders of
    * magnitude below any hot threshold — and (b) shrinks the
    * denominator key count, RAISING the threshold estimate slightly:
    * the sampled plan is conservative for keys sitting exactly at
    * the boundary, and exact for genuinely hot ones. Correctness of
    * [[autoSaltedAgg]]/[[autoSaltedJoin]] is factor-independent, so
    * ANY plan this returns yields identical results — the q220/q221
    * oracle gates run the sampled plan against the plain-SQL answer
    * verbatim. Sampling is seed-deterministic per partition (stable
    * for a stable input layout); replanning on a re-split cluster
    * may flag boundary keys differently, never change results. */
  def saltFactorPlanSampled(
      df: DataFrame, keyCol: String, fraction: Double, seed: Long,
      hotMultiple: Int = 4): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    val sampled = df.sample(withReplacement = false, fraction, seed)
    val c = sampled.groupBy(col(keyCol).as("k"))
      .agg(ceil(count(lit(1)) / lit(fraction)).cast("long").as("c"))
    val s = c.agg(sum(col("c")).as("total"), count(lit(1)).as("nk"))
    c.crossJoin(broadcast(s))
      .withColumn("t", expr(s"($hotMultiple * total) div nk"))
      .filter(col("c") > col("t"))
      .select(col("k"), col("c"), expr("(c + t - 1) div t").as("salt_factor"))
  }

  /** PLANNED variable-factor salted inner equi-join — [[saltedInnerJoin]]
    * driven by a measured per-key plan, the join-side composition of
    * the skew toolkit ([[autoSaltedAgg]] is the aggregation side):
    * left rows of a HOT key get a salt in [0, factor_k) and the right
    * side replicates each hot key's rows factor_k times; COLD keys
    * keep factor 1 — salt 0, one copy, zero overhead. A single global
    * factor must be sized for the hottest key and so replicates the
    * ENTIRE right side that many times; per-key factors bound the
    * replication volume by sum(factor_k x rows_k) over hot keys only,
    * which at 100 TB (a handful of hot keys) is the difference
    * between a bounded build side and factor x the whole dimension.
    * Result is identical to the plain join whatever plan is supplied
    * — salting only splits a key's rows across reducers (the q211
    * oracle gate). Non-positive planned factors fail loudly, as in
    * [[autoSaltedAgg]].
    *
    * The left salt is DETERMINISTIC (`pmod(hash(saltCols...), f_k)`,
    * defaulting to all left columns — same contract and same retry
    * rationale as [[saltedInnerJoin]], matching [[autoSaltedAgg]]'s
    * `hash(saltCol)` convention): a recomputed map task must re-salt
    * each row identically or shuffle retries duplicate/lose rows. */
  def autoSaltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltPlan: DataFrame,
      planKeyCol: String = "k", factorCol: String = "salt_factor",
      saltCols: Seq[String] = Nil): DataFrame = {
    def withFactor(df: DataFrame, key: String): DataFrame = {
      val plan = saltPlan.select(
        col(planKeyCol).as("_pk"), col(factorCol).cast("long").as("_pf"))
      df.join(broadcast(plan), df(key) === col("_pk"), "left")
        .withColumn("_sf",
          when(coalesce(col("_pf"), lit(1L)) >= 1, coalesce(col("_pf"), lit(1L)))
            .otherwise(raise_error(concat(
              lit("autoSaltedJoin: non-positive salt factor "),
              col("_pf").cast("string"), lit(s" planned for a $key key")))))
        .drop("_pk", "_pf")
    }
    val saltSrc = (if (saltCols.nonEmpty) saltCols else left.columns.toSeq).map(col)
    val saltedLeft = withFactor(left, leftKey)
      .withColumn("_salt", pmod(hash(saltSrc: _*).cast("long"), col("_sf")))
      .drop("_sf")
    val explodedRight = withFactor(right, rightKey)
      .withColumn("_salt", explode(sequence(lit(0L), col("_sf") - 1)))
      .drop("_sf")
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey) &&
          saltedLeft("_salt") === explodedRight("_salt"))
      .drop("_salt")
  }

  /** PLANNED two-phase salted aggregation — [[saltedTwoPhaseAgg]]
    * driven by a measured per-key salt plan instead of one global
    * factor (the composition of the q185 planner with the q140
    * executor, end-to-end): `saltPlan` holds one row per HOT key
    * (`planKeyCol`, `factorCol` — exactly the q185 salt-factor
    * planner's output), broadcast-joined onto the input so each hot
    * key splits over ITS OWN factor's reducers while cold keys keep
    * factor 1 — salt 0, one partial, zero overhead beyond the global
    * two-phase shape. A single global factor must be sized for the
    * hottest key and so shatters every COLD key into that many
    * near-empty partials; per-key factors make phase-two's row count
    * sum(factor_k) over hot keys only, which at 100 TB (millions of
    * cold keys, a handful of hot ones) is the difference between a
    * bounded fold and a phase-two as large as the input. Correctness
    * is factor-independent — partials are commutative-associative
    * sums — so the result is identical to the plain `groupBy(key)`
    * (the oracle gate), whatever plan is supplied. A non-positive
    * planned factor fails loudly: pmod against it would null the salt
    * and silently merge the key's rows onto one reducer again. */
  def autoSaltedAgg(
      df: DataFrame, groupKey: String, saltCol: String,
      sumCols: Seq[String], saltPlan: DataFrame,
      planKeyCol: String = "k", factorCol: String = "salt_factor"): DataFrame = {
    val plan = saltPlan.select(
      col(planKeyCol).as(groupKey), col(factorCol).cast("int").as("_sf"))
    val salted = df.join(broadcast(plan), Seq(groupKey), "left")
      .withColumn("_sf",
        when(coalesce(col("_sf"), lit(1)) >= 1, coalesce(col("_sf"), lit(1)))
          .otherwise(raise_error(concat(
            lit("autoSaltedAgg: non-positive salt factor "),
            col("_sf").cast("string"), lit(s" planned for a $groupKey key")))))
      .withColumn("_salt", pmod(hash(col(saltCol)), col("_sf")))
    val partial = salted
      .groupBy(col(groupKey), col("_salt"))
      .agg(count(lit(1)).as("_pn"),
        sumCols.map(c => sum(col(c)).as(s"_ps_$c")): _*)
    partial.groupBy(col(groupKey))
      .agg(sum(col("_pn")).as("n_rows"),
        sumCols.map(c => sum(col(s"_ps_$c")).as(s"sum_$c")): _*)
  }

  /** Bloom-pruned inner equi-join — the explicit runtime-filter
    * pattern for the "huge fact ⋈ selective dim" shape at 100 TB:
    * build a Bloom filter over the SMALL side's join keys (one
    * distributed aggregate folding to a bounded few-hundred-KB sketch
    * on the driver), ship it once per executor, and prune the HUGE
    * side BEFORE its shuffle with the codegen'd membership probe
    * ([[graft.functions.BloomFilterStatic]]). Blooms have no false
    * negatives, so pruning can never change the join result — only
    * false positives shuffle needlessly and the exact join still
    * drops them; `fpp` tunes shuffle volume, never correctness. That
    * identity with the plain join IS the q159 oracle gate. (Spark's
    * AQE injects this filter for some plans on its own; the explicit
    * operator covers fixed plans, non-AQE paths, and lets the
    * filter build ride a frame AQE cannot see through, e.g. a
    * computed dimension.)
    *
    * Keys probe as strings (the static-filter expression's domain) —
    * numeric keys cast losslessly on both build and probe side.
    */
  def bloomPrunedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    // empty-dim guard: bloomFilter on a zero-row frame NPEs inside
    // Spark (null aggregation buffer), and an empty dim means an empty
    // join anyway — prune everything without building a filter. The
    // extra action runs on the DIM side only (bounded by contract).
    if (small.isEmpty) {
      val none = big.filter(lit(false))
      none.join(small, none(bigKey) === small(smallKey))
    } else {
      val filter = small.stat.bloomFilter(
        col(smallKey).cast("string"), expectedKeys, fpp)
      val pruned = big.filter(graft.functions.BloomMightContain
        .bloomMightContain(col(bigKey).cast("string"), filter))
      pruned.join(small, pruned(bigKey) === small(smallKey))
    }
  }
}
