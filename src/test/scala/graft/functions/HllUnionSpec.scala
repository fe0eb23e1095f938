package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q144's gating assumptions on the DataSketches HLL built-ins: union
  * of slice-sketches estimates like the whole-corpus sketch (the
  * mergeability 100 TB relies on), small cardinalities are EXACT (the
  * sketch's sparse mode), and slicing choice never changes the
  * estimate.
  */
class HllUnionSpec extends SparkSpec {

  test("union of two half sketches == whole-corpus sketch estimate; small n exact") {
    val spark0 = spark
    import spark0.implicits._
    // 200 distinct values (exact range for lgConfigK 12), duplicated
    val rows = (0 until 200).flatMap(i => Seq.fill(1 + i % 3)(s"v$i"))
      .zipWithIndex.map { case (v, i) => (v, i % 2) }
    val df = rows.toDF("term", "half").repartition(8)
    val whole = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("term"), lit(12))).as("e"))
      .collect()(0).getLong(0)
    val unioned = df.groupBy(col("half"))
      .agg(hll_sketch_agg(col("term"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(
        hll_union(min(col("sk")), max(col("sk")))).as("e"))
      .collect()(0).getLong(0)
    assert(whole == 200L, s"small-n estimate not exact: $whole")
    assert(unioned == whole,
      s"union of halves ($unioned) diverged from the one-pass sketch ($whole)")
  }

  test("estimate is slicing-invariant and within tolerance at larger n") {
    val spark0 = spark
    import spark0.implicits._
    val n = 50000
    val ests = Seq(2, 5).map { parts =>
      (0 until n).map(i => s"k$i").toDF("term").repartition(parts)
        .agg(hll_sketch_estimate(hll_sketch_agg(col("term"), lit(12))))
        .collect()(0).getLong(0)
    }
    assert(ests.distinct.size == 1, s"slicing changed the estimate: $ests")
    assert(math.abs(ests.head - n) <= n * 0.05,
      s"estimate ${ests.head} outside 5% of $n")
  }
}
