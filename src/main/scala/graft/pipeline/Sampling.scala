package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data
  * pipelines.
  *
  * `sample(fraction)` / `randomSplit` are seed-dependent AND
  * partitioning-dependent — rerunning after a repartition reshuffles
  * the assignment, which silently leaks test documents into training
  * sets. The standard fix at corpus scale is a content-stable hash
  * split: a document's split follows from its id alone, is identical
  * on every engine and every rerun, and needs no state. The md5-hex
  * prefix compare keeps it engine-agnostic (exact same assignment in
  * the DuckDB oracle) — the first 8 hex chars are a uniform 32-bit
  * value, compared against floor(frac * 2^32) rendered in hex.
  *
  * Every selection is SALTED BY PURPOSE: hashing the raw id for every
  * decision would make the decisions nested, not independent — a
  * mixture slice at rate r would be exactly the lowest-r hash region,
  * so the whole test split (testFrac = t) would sit inside any mixture
  * with r >= t, and a mixture with r <= t would consist entirely of
  * test documents — precisely the train/test leakage this module
  * exists to prevent. `hashBucket(salt, key)` prepends "salt:" to the
  * key before hashing, giving each purpose (split, each mixture
  * source, shard assignment) its own independent uniform hash.
  */
object Sampling {

  private def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction must be in [0,1], got $frac")
    f"${math.floor(frac * 4294967296.0).toLong.min(4294967295L)}%08x"
  }

  /** Uniform hash bucket of a key column as an 8-hex-char string,
    * independent across distinct `salt` values. */
  def hashBucket(salt: String, key: Column): Column =
    substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8)

  /** Stable boolean: true for the `frac`-sized slice of the keyspace
    * under this salt's hash. Slices with different salts overlap
    * proportionally (independent), never nested. */
  def inSlice(salt: String, key: Column, frac: Double): Column = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction must be in [0,1], got $frac")
    // frac == 1.0 must select ALL rows; the strict compare would drop a
    // key whose salted md5 prefix is exactly ffffffff
    if (frac >= 1.0) lit(true)
    else hashBucket(salt, key) < lit(hexThreshold(frac))
  }

  /** Adds a `split` column: 'test' for a stable ~testFrac of rows keyed
    * on `idCol`, 'train' for the rest. Rerun- and partition-invariant. */
  def withSplit(
      df: DataFrame, idCol: String, testFrac: Double,
      salt: String = "split"): DataFrame =
    df.withColumn("split",
      when(inSlice(salt, col(idCol), testFrac), lit("test")).otherwise(lit("train")))

  /** Deterministic weighted corpus mixing: each source contributes a
    * stable `rate`-sized slice of its keyspace ([[inSlice]] salted by
    * the source name, so the slices are mutually independent AND
    * independent of the train/test split), unioned into one frame with
    * a `source` tag. The standard way training mixtures are drawn at
    * corpus scale — no RNG state, rerunnable, and each source's
    * inclusion decision is per-row (fully parallel, no sampling
    * shuffle). Rates > 1.0 are capped at 1.0 (upsampling by repetition
    * is a separate, explicit step). */
  def mixSources(
      sources: Seq[(String, DataFrame, Double)], idCol: String,
      salt: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "at least one source required")
    sources.map { case (name, df, rate) =>
      df.filter(inSlice(s"$salt:$name", col(idCol), math.min(rate, 1.0)))
        .withColumn("source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Stratified rebalancing sample: each stratum (language, source,
    * domain...) keeps its own stable hash slice at its own rate — the
    * corpus-rebalancing step that reshapes a crawl's language/domain
    * distribution into the training target distribution. Strata not in
    * `rates` fall back to `defaultRate`; rates >= 1 keep the whole
    * stratum.
    *
    * The hash key is `stratum:id` under one purpose salt, so slices
    * are independent ACROSS strata and of every other salted decision
    * (split, mixing, sharding); the rate lookup is a codegen'd CASE
    * chain, so the whole selection is a per-row predicate — no
    * sampleBy RNG state, no shuffle, rerun- and
    * partition-invariant. */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "strata"): DataFrame = {
    val bucket = hashBucket(salt,
      concat_ws(":", col(strataCol), col(idCol).cast("string")))
    def sliceCond(r: Double): Column = {
      require(r >= 0.0, s"rate must be >= 0, got $r")
      if (r >= 1.0) lit(true) else bucket < lit(hexThreshold(r))
    }
    val pred = rates.toSeq.sortBy(_._1).foldLeft(sliceCond(defaultRate)) {
      case (acc, (s, r)) => when(col(strataCol) === s, sliceCond(r)).otherwise(acc)
    }
    df.filter(pred)
  }

  /** Deterministic uniform-without-replacement sample of k rows per
    * group: rank by the salted md5 of the id (a deterministic "random"
    * permutation — same salt-independence argument as [[withSplit]])
    * and keep the first k. The reservoir-sampling replacement for
    * pipelines that must be rerun-reproducible: no RNG state, no
    * seed-per-partition coupling, membership stable under
    * repartitioning and reruns. The rank window partitions by group;
    * for a corpus-sized hot group the bounded-heap
    * [[graft.functions.TopKAggregator]] formulation substitutes (k
    * smallest hashes per group), exactly as in
    * [[graft.corpus.CorpusOps.perSourceTopK]]. */
  def uniformPerGroup(
      df: DataFrame, groupCol: String, idCol: String, k: Int,
      salt: String = "sample"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** Deterministic per-source TOKEN-budget sampling: pretraining mixes
    * are specified in tokens, not document counts ([[uniformPerGroup]]
    * caps docs; this caps tokens). Each source's docs are ranked by the
    * salted md5 permutation (the same deterministic shuffle every other
    * selection here uses), and a doc survives iff the tokens BEFORE it
    * in that order are under the budget — so the doc that crosses the
    * boundary is the last one kept and every source lands within one
    * document of its budget. One window per source (bounded groups,
    * never a global cumsum); token counts via [[
    * graft.functions.TextFunctions.tokenCount]], whose oracle parity is
    * established (q16). Output keeps `n_tokens` for downstream
    * accounting. Rerun/partition/engine-invariant like the rest of the
    * family. */
  def sampleToTokenBudget(
      df: DataFrame, idCol: String, textCol: String, srcCol: String,
      budgetTokens: Long, salt: String = "budget"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0, "budgetTokens must be positive")
    // silently replacing a caller's own token accounting (e.g. a real
    // subword tokenizer's n_tokens) with the whitespace recount would
    // corrupt the budget downstream — refuse instead
    require(!df.columns.contains("n_tokens") && !df.columns.contains("cum_before"),
      "sampleToTokenBudget derives its own n_tokens/cum_before columns — " +
        "rename or drop the existing ones first")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), col(idCol))
    df.withColumn("n_tokens",
        coalesce(graft.functions.TextFunctions.tokenCount(col(textCol))
          .cast("long"), lit(0L)))
      .withColumn("cum_before", coalesce(
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("cum_before") < budgetTokens)
      .drop("cum_before")
  }

  /** Sharded concat-and-chunk packing: assigns each document to a
    * fixed-token-budget bin, the way LLM training shards are packed.
    *
    * The naive formulation is a GLOBAL running token sum — one
    * partition, a scale dead end. Real pipelines pack per shard: a
    * stable hash splits the corpus into `nShards` independent streams,
    * each shard concatenates its documents in id order, and a document
    * lands in the bin containing its start offset
    * (`bin = floor(startOffset / binSize)` with
    * `startOffset = cumsum - toks`) — the concat-then-chunk layout LLM
    * pretraining shards use. Shard and bin both derive from data (md5
    * shard, id order), so the layout is deterministic, parallel (one
    * window per shard), and reproducible on any engine. The shard hash
    * is salted like every other selection, so shard membership is
    * independent of split/mixture membership. */
  /** Sharded curriculum schedule: each md5 shard orders its documents
    * easiest-first by `scoreCol` (desc — higher score = cleaner =
    * earlier), splits them into `nStages` contiguous difficulty stages
    * (ntile), and numbers positions within (shard, stage). The global
    * curriculum is approximated per shard, exactly how data-loader
    * workers consume shards independently — every window partitions by
    * shard, so the schedule is fully parallel; a single global
    * ORDER BY would funnel the corpus through one task. Deterministic:
    * shard from the id's md5, order by (score, id). */
  def curriculumSchedule(
      df: DataFrame, idCol: String, scoreCol: String,
      nStages: Int, nShards: Int = 32, salt: String = "curr"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nStages > 0 && nShards > 0)
    val shard = conv(substring(
        md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 4), 16, 10)
      .cast("long") % nShards
    val wStage = Window.partitionBy(col("shard"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val wPos = Window.partitionBy(col("shard"), col("stage"))
      .orderBy(col(idCol))
    df.withColumn("shard", shard)
      .withColumn("stage", ntile(nStages).over(wStage).cast("long"))
      .withColumn("pos", row_number().over(wPos).cast("long"))
  }

  /** Temperature-flattened per-source quotas (the multilingual /
    * multi-source sampling recipe: rates proportional to n^(1/T),
    * T = 2 here via sqrt — flattens head sources, boosts the tail):
    * each source's quota out of `budget` is relative to the LARGEST
    * source, so no floating-point SUM enters the arithmetic (fp
    * summation order varies by engine and would break determinism;
    * sqrt and one division are correctly-rounded IEEE ops identical
    * everywhere). One groupBy over the corpus; everything after runs
    * on |sources| rows. */
  def temperatureQuotas(
      df: DataFrame, srcCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"))
    // unpartitioned window is fine HERE: it runs over the aggregated
    // |sources| rows, never the corpus
    counts
      .withColumn("mx", max(col("n_docs")).over(Window.partitionBy()))
      .withColumn("quota", floor(
        (lit(budget.toDouble) * sqrt(col("n_docs").cast("double"))) /
          sqrt(col("mx").cast("double"))).cast("long"))
      .drop("mx")
  }

  def packIntoBins(
      df: DataFrame, idCol: String, tokCol: String,
      binSize: Long, nShards: Int = 32, salt: String = "pack"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binSize > 0 && nShards > 0)
    val shard = conv(substring(
        md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 4), 16, 10)
      .cast("long") % nShards
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("cum", sum(col(tokCol)).over(w))
      .withColumn("bin", ((col("cum") - col(tokCol)) / binSize).cast("long"))
      .drop("cum")
  }
}
