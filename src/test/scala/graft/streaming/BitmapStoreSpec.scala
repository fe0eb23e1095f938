package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BitmapStore: batch-sliced merges must equal the one-pass rollup
  * bit for bit, redelivery must be absorbed (OR idempotence — the
  * at-least-once contract), and guards must fail loudly.
  */
class BitmapStoreSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-bms-$tag").toString

  private def masksOf(store: String): Map[String, Long] =
    BitmapStore.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("sliced merges equal the one-pass rollup; '*' row ORs everything") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      ("a", 0L), ("a", 3L), ("a", 61L), ("b", 3L), ("b", 7L), ("c", 0L))
      .toDF("grp", "bucket")
    val store = freshDir("parity")
    BitmapStore.seed(spark, store)
    // three uneven slices
    BitmapStore.mergeBatch(rows.limit(2), "grp", "bucket", store)
    BitmapStore.mergeBatch(rows.offset(2).limit(3), "grp", "bucket", store)
    BitmapStore.mergeBatch(rows.offset(5), "grp", "bucket", store)
    val got = masksOf(store)
    val want = Map(
      "a" -> ((1L << 0) | (1L << 3) | (1L << 61)),
      "b" -> ((1L << 3) | (1L << 7)),
      "c" -> (1L << 0))
    assert(got == want)
    val served = BitmapStore.serve(spark, store).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(served("a") == ((want("a"), 3L)))
    assert(served("*") == ((want.values.reduce(_ | _), 4L)))
  }

  test("redelivering a batch changes NOTHING (at-least-once by algebra)") {
    val spark0 = spark
    import spark0.implicits._
    val batch = Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("grp", "bucket")
    val store = freshDir("replay")
    BitmapStore.seed(spark, store)
    BitmapStore.mergeBatch(batch, "grp", "bucket", store)
    val before = masksOf(store)
    BitmapStore.mergeBatch(batch, "grp", "bucket", store) // redelivery
    BitmapStore.mergeBatch(batch, "grp", "bucket", store) // and again
    assert(masksOf(store) == before)
  }

  test("bucket outside [0, 61] fails loudly; unseeded store refuses reads") {
    val spark0 = spark
    import spark0.implicits._
    val store = freshDir("guards")
    BitmapStore.seed(spark, store)
    val bad = Seq(("a", 62L)).toDF("grp", "bucket")
    val e = intercept[Exception] {
      BitmapStore.mergeBatch(bad, "grp", "bucket", store)
    }
    assert(e.getMessage != null)
    val empty = freshDir("unseeded")
    val e2 = intercept[IllegalArgumentException] {
      BitmapStore.read(spark, empty)
    }
    assert(e2.getMessage.contains("seed"))
  }
}
