package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SortedNeighborhood: the distributed global rank must equal the
  * single-order row_number definition, SNM pairing must produce exactly
  * the rank-window pairs, and the candidate count must stay bounded at
  * n*w - w(w+1)/2 under ANY key skew (the property that distinguishes
  * SNM from inverted-index blocking).
  */
class SortedNeighborhoodSpec extends SparkSpec {

  test("globalRank equals the total-order row_number, distributed") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("c", 3L), ("a", 1L), ("b", 2L), ("a", 4L), ("c", 0L))
      .toDF("k", "id")
    val ranked = SortedNeighborhood.globalRank(
      df, Seq(col("k"), col("id")), "r")
    val got = ranked.select("k", "id", "r").as[(String, Long, Long)]
      .collect().sortBy(_._3)
    val want = Seq(("a", 1L), ("a", 4L), ("b", 2L), ("c", 0L), ("c", 3L))
    assert(got.map(t => (t._1, t._2)).toSeq == want)
    assert(got.map(_._3).toSeq == (1L to 5L))
  }

  test("snmPairs: hand-computed window pairs with same_key diagnosis") {
    val spark0 = spark
    import spark0.implicits._
    // sorted order by (k, id): (a,1) (a,2) (b,5) (c,3) -> w=2 pairs:
    // (1,2,d1,T) (1,5,d2,F) (2,5,d1,F) (2,3,d2,F) (5,3,d1,F)
    val df = Seq((1L, "a"), (2L, "a"), (3L, "c"), (5L, "b")).toDF("id", "k")
    val got = SortedNeighborhood.snmPairs(df, col("k"), col("id"), w = 2)
      .select("id_a", "id_b", "dist", "same_key")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val want = Set(
      (1L, 2L, 1L, true), (1L, 5L, 2L, false), (2L, 5L, 1L, false),
      (2L, 3L, 2L, false), (5L, 3L, 1L, false))
    assert(got == want)
  }

  test("candidate count is exactly n*w - w(w+1)/2 even under total key skew") {
    val spark0 = spark
    import spark0.implicits._
    // one hot key for every row: an inverted-index join would square;
    // SNM stays linear in n by construction
    val n = 500
    val w = 4
    val df = (1 to n).map(i => (i.toLong, "same")).toDF("id", "k")
    val cnt = SortedNeighborhood.snmPairs(df, col("k"), col("id"), w).count()
    assert(cnt == n.toLong * w - w.toLong * (w + 1) / 2)
  }

  test("per-partition offsets compose across REAL multi-partition range splits") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1 to 10000).map(i => (i.toLong, (i % 97).toString))
      .toDF("id", "k")
    // precondition: an explicit-count range repartition is honored (AQE
    // never coalesces a user-specified partition count), so globalRank's
    // offset arithmetic below really spans 8 populated partitions
    val parts = df.repartitionByRange(8, col("k"), col("id"))
      .select(spark_partition_id()).distinct().count()
    assert(parts == 8L, s"range split degenerated to $parts partitions")
    val ranked = SortedNeighborhood.globalRank(
      df, Seq(col("k"), col("id")), "r", numPartitions = 8)
    // a wrong offset for ANY of the 8 partitions would collide or gap
    // the rank sequence — an exact 1..n permutation proves composition
    val rs = ranked.select("r").as[Long].collect().sorted
    assert(rs.head == 1L && rs.last == 10000L && rs.distinct.length == 10000)
  }
}
