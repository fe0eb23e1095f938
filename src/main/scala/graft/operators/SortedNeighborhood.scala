package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood method (SNM) candidate generation — the classic
  * record-linkage blocking strategy (Hernandez & Stolfo, SIGMOD '95):
  * sort the corpus by a fuzzy blocking key and emit every pair within a
  * fixed window of the sorted order. Where LSH blocks by CONTENT
  * buckets, SNM blocks by sort ADJACENCY — it catches near-duplicates
  * whose keys differ slightly (typos, prefixes) as long as they sort
  * near each other, and its candidate count is exactly `n * w`
  * regardless of skew: a hot key cannot blow up the pair space the way
  * it does in an inverted-index join.
  *
  * Scale shape: the one primitive SNM needs is a GLOBAL dense rank of
  * the sort order. The naive `row_number() OVER (ORDER BY key)` is a
  * single-partition window — every row through one task, the thing
  * that dies first at 100 TB. [[globalRank]] instead computes it
  * distributively in two passes (the public zipWithIndex recipe):
  * range-repartition + local sort, count rows per partition (a
  * partition-count-sized aggregate), broadcast the prefix-sum offsets
  * back, and add each partition's offset to its local rank. Pair
  * generation is then one bounded explode (w rows per doc) plus one
  * integer equi-join on rank — no self-join on the sort key, no
  * window spanning partitions.
  */
object SortedNeighborhood {

  /** Global 1-based dense row rank of `df` under `sortCols` (which must
    * include a unique tiebreaker for determinism), as column `rankCol`.
    * Distributed: no single-partition window anywhere. A rank is
    * exactly the inclusive running count of the total order, so this
    * IS [[PrefixScan.prefixSum]] of the constant 1 — one shared
    * two-pass lifecycle (range repartition, persist-while-collecting
    * per-partition totals, broadcast prefix offsets, eager
    * materialization) instead of two copies to patch in lockstep. */
  def globalRank(
      df: DataFrame, sortCols: Seq[Column], rankCol: String,
      numPartitions: Int = 0): DataFrame =
    PrefixScan.prefixSum(df, sortCols, lit(1L), rankCol, numPartitions)

  /** SNM candidate pairs: every (a, b) with `0 < rank(b) - rank(a) <= w`
    * under the (`keyCol`, `idCol`) sort order. Output columns: `id_a`,
    * `id_b`, `dist` (rank distance, 1..w), `same_key` (whether the two
    * blocking keys are identical — the self-diagnosing signal for
    * whether the window is doing fuzzy work or just re-finding exact
    * key groups). Exactly one row per qualifying pair. */
  def snmPairs(df: DataFrame, keyCol: Column, idCol: Column, w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val ranked = globalRank(
      df.select(idCol.as("id"), keyCol.as("k")),
      Seq(col("k"), col("id")), "r")
    val left = ranked.select(col("id").as("id_a"), col("k").as("k_a"),
        col("r").as("ra"),
        explode(sequence(lit(1), lit(w))).as("dist"))
      .withColumn("rb", col("ra") + col("dist"))
    val right = ranked.select(col("id").as("id_b"), col("k").as("k_b"),
      col("r").as("rb"))
    left.join(right, "rb")
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"),
        (col("k_a") === col("k_b")).as("same_key"))
  }
}
