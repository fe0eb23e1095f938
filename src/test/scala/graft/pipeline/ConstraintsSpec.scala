package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Constraints._

class ConstraintsSpec extends SparkSpec {

  test("every rule kind counts exactly its violations on a poisoned frame") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (Some(1L), Some(10.0), "A", "ok", 1L),
      (Some(1L), Some(99.0), "A", "ok", 1L),   // dup key + out of range
      (None, Some(5.0), "X", "ok", 2L),        // null id + bad set value
      (Some(3L), None, "N", "bad!", 7L),       // null range col + bad regex + dangling ref
      (Some(4L), Some(25.0), "R", "ok", 1L)
    ).toDF("id", "qty", "flag", "tag", "ref")
    val dim = Seq(1L, 2L, 4L).toDF("k")
    val report = Constraints.check(df, Seq(
        notNull("id"),
        inRange("qty", 1.0, 25.0),
        oneOf("flag", Seq("A", "N", "R")),
        matches("tag", "^[a-z]+$"),
        Unique(Seq("id")),
        RefIn("ref", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report == Map(
      "not_null:id" -> 1L,
      "in_range:qty[1.0,25.0]" -> 2L,   // 99.0 and the null
      "one_of:flag[A,N,R]" -> 1L,
      "matches:tag[^[a-z]+$]" -> 1L,
      "unique:id" -> 1L,                // one surplus row for key 1
      "ref_in:ref->k" -> 1L))           // ref=7 dangles
  }

  test("observed(): violation counts ride the main job — no second scan — and match check()") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (Some(1L), Some(10.0)), (None, Some(99.0)), (Some(3L), None)
    ).toDF("id", "qty")
    val rules = Seq(notNull("id"), inRange("qty", 1.0, 25.0))
      .collect { case r: RowRule => r }
    val (instrumented, obs) = Constraints.observed(df, rules)
    // the caller's own action (here a write) is the only job that runs
    val out = java.nio.file.Files.createTempDirectory("obs").toString + "/d"
    instrumented.write.mode("overwrite").parquet(out)
    val metrics = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    val viaCheck = Constraints.check(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(metrics == viaCheck)
    assert(metrics == Map("not_null:id" -> 1L, "in_range:qty[1.0,25.0]" -> 2L))
    // and the written data is untouched by the instrumentation
    assert(spark.read.parquet(out).count() == 3)
  }

  test("empty table reports zero violations; duplicate rule names refuse") {
    val spark0 = spark
    import spark0.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "qty")
    val report = Constraints.check(empty,
      Seq(notNull("id"), inRange("qty", 1.0, 5.0)))
    assert(report.collect().map(_.getLong(1)).toSeq == Seq(0L, 0L))
    intercept[IllegalArgumentException] {
      Constraints.check(empty, Seq(notNull("id"), notNull("id")))
    }
  }

  test("clean frame reports all zeros; row rules share one aggregate pass") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "qty")
    val report = Constraints.check(df,
      Seq(notNull("id"), inRange("qty", 1.0, 5.0)))
    assert(report.collect().map(_.getLong(1)).forall(_ == 0L))
    // the report for N row rules is |rules| rows from ONE aggregate —
    // shape contract, not a plan assert (check() materializes counts
    // driver-side); verify the output cardinality at least
    assert(report.count() == 2)
  }
}
