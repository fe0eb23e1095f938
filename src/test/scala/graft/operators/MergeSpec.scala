package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge.mergeUpsert: the four MERGE arbitration outcomes (keep /
  * update / insert / delete), the delete-of-absent-key no-op, and the
  * schema contract.
  */
class MergeSpec extends SparkSpec {

  private def fixture() = {
    val spark0 = spark
    import spark0.implicits._
    val target = Seq(
      (1L, "a", 10L), // updated by source
      (2L, "b", 20L), // deleted by source (del flag)
      (3L, "c", 30L)  // untouched -> keep
    ).toDF("k", "s", "v")
    val source = Seq(
      (1L, "a2", 11L),  // update
      (2L, "del", 0L),  // delete
      (4L, "d", 40L),   // insert
      (5L, "del", 0L)   // delete of absent key -> no-op (no row out)
    ).toDF("k", "s", "v")
    (target, source)
  }

  test("update / insert / keep / delete arbitration") {
    val (target, source) = fixture()
    val out = Merge.mergeUpsert(target, source, "k", col("s_s") === "del")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet == Set(1L, 3L, 4L))
    assert(out(1L) == (("a2", 11L, "update")))
    assert(out(3L) == (("c", 30L, "keep")))
    assert(out(4L) == (("d", 40L, "insert")))
  }

  test("result is a valid next snapshot: unique keys, same payload schema + op") {
    val (target, source) = fixture()
    val out = Merge.mergeUpsert(target, source, "k", col("s_s") === "del")
    assert(out.columns.toSeq == Seq("k", "s", "v", "op"))
    val keys = out.select("k").collect().map(_.getLong(0))
    assert(keys.length == keys.distinct.length)
  }

  test("mismatched schemas are rejected loudly") {
    val spark0 = spark
    import spark0.implicits._
    val t = Seq((1L, "a")).toDF("k", "s")
    val s = Seq((1L, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.mergeUpsert(t, s, "k", lit(false))
    }
    assert(e.getMessage.contains("identical schemas"))
  }

  test("idempotence: merging the merged snapshot with the same source is stable") {
    val (target, source) = fixture()
    val m1 = Merge.mergeUpsert(target, source, "k", col("s_s") === "del").drop("op")
    val m2 = Merge.mergeUpsert(m1, source, "k", col("s_s") === "del").drop("op")
    val a = m1.orderBy("k").collect().map(_.toSeq)
    val b = m2.orderBy("k").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
