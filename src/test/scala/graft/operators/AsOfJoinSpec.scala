package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asOfBackward: latest at-or-before match, null when none, inclusive ties") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1, ts("2024-01-01 10:00:00"), "e1"),  // after v2
      (1, ts("2024-01-01 09:00:00"), "e2"),  // exactly at v2 (inclusive)
      (1, ts("2024-01-01 07:00:00"), "e3"),  // before any version -> null
      (2, ts("2024-01-01 10:00:00"), "e4")   // key with no right rows -> null
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1, ts("2024-01-01 08:00:00"), 100L),  // v1
      (1, ts("2024-01-01 09:00:00"), 200L)   // v2
    ).toDF("k", "ts", "version")

    val out = AsOfJoin.asOfBackward(left, "k", "ts", right, "k", "ts",
        "version", "asof_version")
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(
      "e1" -> Some(200L), "e2" -> Some(200L), "e3" -> None, "e4" -> None))
  }

  test("asOfBackward: a matched version with a NULL value yields NULL, not the stale value") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1, ts("2024-01-01 10:00:00"), "e1")).toDF("k", "ts", "name")
    val right = Seq(
      (1, ts("2024-01-01 08:00:00"), Some(100L)),
      (1, ts("2024-01-01 09:00:00"), Option.empty[Long]) // latest version: value NULL
    ).toDF("k", "ts", "version")
    val out = AsOfJoin.asOfBackward(left, "k", "ts", right, "k", "ts",
      "version", "v").collect()(0)
    assert(out.isNullAt(3), "should surface the latest version's NULL, not 100")
  }

  test("asOfBackward equals naive range-join + argmax on real tables") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.table(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("ts")).limit(300)
    val o = graft.Tables.table(spark, sf001, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val viaWindow = AsOfJoin.asOfBackward(e, "user_id", "ts",
        o, "o_custkey", "o_orderdate", "o_orderkey", "v")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    val naive = e.join(o,
        e("user_id") === o("o_custkey") &&
          o("o_orderdate").cast("timestamp") <= e("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("o_orderkey"), col("o_orderdate")).as("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(viaWindow == naive)
  }
}
