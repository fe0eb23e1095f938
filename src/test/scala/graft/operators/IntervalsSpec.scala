package graft.operators

import graft.SparkSpec

/** Intervals.coverage: hand-computed islands — overlap, containment,
  * half-open adjacency, disjoint gaps — and the double-count property
  * the operator exists to fix.
  */
class IntervalsSpec extends SparkSpec {

  test("hand-computed islands: overlap merges, adjacency merges, gaps split") {
    val spark0 = spark
    import spark0.implicits._
    val iv = Seq(
      // u1: [0,10) + [5,12) overlap -> [0,12); [12,20) adjacent (half-open
      // touch) -> merges; [30,35) disjoint -> second island
      ("u1", 1L, 0L, 10L), ("u1", 2L, 5L, 12L), ("u1", 3L, 12L, 20L),
      ("u1", 4L, 30L, 35L),
      // u2: containment [0,100) ⊇ [10,20) -> one island of 100
      ("u2", 5L, 0L, 100L), ("u2", 6L, 10L, 20L)
    ).toDF("k", "id", "s", "e")
    val out = Intervals.coverage(iv, "k", "s", "e", "id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("u1") == ((2L, 25L)), s"u1 got ${out("u1")}") // 20 + 5
    assert(out("u2") == ((1L, 100L)))
  }

  test("union length, not sum of lengths: overlaps are never double-counted") {
    val spark0 = spark
    import spark0.implicits._
    // 50 copies of the same interval: naive sum = 500, union = 10
    val iv = (1L to 50L).map(i => ("k", i, 100L, 110L)).toDF("k", "id", "s", "e")
    val out = Intervals.coverage(iv, "k", "s", "e", "id").collect().head
    assert(out.getLong(1) == 1L && out.getLong(2) == 10L)
  }

  test("start ties resolve deterministically via the ord column") {
    val spark0 = spark
    import spark0.implicits._
    val iv = Seq(("k", 2L, 0L, 5L), ("k", 1L, 0L, 50L), ("k", 3L, 40L, 60L))
      .toDF("k", "id", "s", "e")
    val out = Intervals.coverage(iv, "k", "s", "e", "id").collect().head
    assert(out.getLong(1) == 1L && out.getLong(2) == 60L)
  }
}
