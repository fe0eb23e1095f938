package graft.operators

import graft.SparkSpec

/** RobustStats.madOutliers: hand-computed median/MAD fixtures, the
  * doubled-units integer exactness (even-count interpolated medians),
  * and robustness vs the mean (the outlier must not mask itself).
  */
class RobustStatsSpec extends SparkSpec {

  test("hand-computed fixture: only the far point flags") {
    val spark0 = spark
    import spark0.implicits._
    // g: median=10 -> med2=20; a2=[20,0,0,0,20,180]; MAD*4=20
    // rule 2*a2 > 3*20 -> a2 > 30 -> only x=100
    val df = Seq(
      ("g", 1L, 0L), ("g", 2L, 10L), ("g", 3L, 10L),
      ("g", 4L, 10L), ("g", 5L, 20L), ("g", 6L, 100L),
      // h: median=2 -> a2=[2,0,4], mad2a=4 -> 2*a2>12 -> none
      ("h", 7L, 1L), ("h", 8L, 2L), ("h", 9L, 4L)
    ).toDF("grp", "id", "x")
    val out = RobustStats.madOutliers(df, "grp", "x", k = 3)
      .select("id", "a2", "mad2a").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(6L))
    assert(out.head.getLong(1) == 180L && out.head.getLong(2) == 20L)
  }

  test("half-integral median stays exact in doubled units") {
    val spark0 = spark
    import spark0.implicits._
    // median of [1,2] is 1.5 — doubled to an exact 3
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L)).toDF("grp", "id", "x")
    val out = RobustStats.madOutliers(df, "grp", "x", k = 3).collect()
    assert(out.isEmpty) // a2=[1,1], mad2a=2: 2*1 > 6 is false
  }

  test("robustness: an extreme outlier cannot drag the threshold (mean would)") {
    val spark0 = spark
    import spark0.implicits._
    val base = (1L to 99L).map(i => ("g", i, 100L + (i % 5))) // tight cluster
    val df = (base :+ (("g", 100L, 1000000L))).toDF("grp", "id", "x")
    val flagged = RobustStats.madOutliers(df, "grp", "x", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(flagged.contains(100L),
      "the extreme point must flag — with mean/stddev it would inflate sigma and hide")
    assert(flagged.size < 50, "the tight cluster must not mass-flag")
  }

  test("k is respected: larger k flags fewer") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 50L).map(i => ("g", i, i * i)).toDF("grp", "id", "x")
    val k3 = RobustStats.madOutliers(df, "grp", "x", k = 3).count()
    val k6 = RobustStats.madOutliers(df, "grp", "x", k = 6).count()
    assert(k6 <= k3)
  }
}
