package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PrefixScan: the distributed running sum must equal the
  * single-order window definition, including across REAL multi-
  * partition range splits, negative values, and zero rows.
  */
class PrefixScanSpec extends SparkSpec {

  test("hand-computed inclusive running sum over the (k, id) order") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("b", 3L, 10L), ("a", 1L, 1L), ("a", 2L, 5L), ("c", 4L, -2L))
      .toDF("k", "id", "v")
    val got = PrefixScan.prefixSum(
        df, Seq(col("k"), col("id")), col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // order: (a,1,1) (a,2,5) (b,3,10) (c,4,-2) -> 1, 6, 16, 14
    assert(got == Map(1L -> 1L, 2L -> 6L, 3L -> 16L, 4L -> 14L))
  }

  test("offsets compose across REAL range partitions: matches one-partition truth") {
    val spark0 = spark
    import spark0.implicits._
    val n = 5000
    val df = (1 to n).map(i => (i.toLong, ((i * 7919) % 100).toLong))
      .toDF("id", "v")
    val got = PrefixScan.prefixSum(
        df, Seq(col("id")), col("v"), "cum", numPartitions = 8)
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    var run = 0L
    (1 to n).foreach { i =>
      run += (i * 7919) % 100
      assert(got(i - 1) == ((i.toLong, run)), s"row $i: ${got(i - 1)}")
    }
  }

  test("input columns pass through; empty input yields empty output") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 2L, "keep")).toDF("id", "v", "tag")
    val out = PrefixScan.prefixSum(df, Seq(col("id")), col("v"), "cum")
    assert(out.columns.toSet == Set("id", "v", "tag", "cum"))
    val empty = PrefixScan.prefixSum(
      df.filter(col("id") < 0), Seq(col("id")), col("v"), "cum")
    assert(empty.count() == 0L)
  }
}
