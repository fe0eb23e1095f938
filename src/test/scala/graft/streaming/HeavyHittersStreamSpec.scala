package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.functions.{MisraGriesAgg, TextFunctions}

class HeavyHittersStreamSpec extends SparkSpec {

  private def docTokens(dd: org.apache.spark.sql.DataFrame) =
    dd.select(explode(TextFunctions.words(col("text"))).as("term"))

  private def served(store: String) = {
    val d = graft.Tables.table(spark, sf001, "documents")
    HeavyHittersStream.heavyHitters(spark, store, docTokens(d), "term")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
  }

  /** The inline single-pass answer (q124's shape) — the parity target. */
  private def inline(): Set[(String, Long)] = {
    val cap = 64
    val toks = docTokens(graft.Tables.table(spark, sf001, "documents"))
    val row = toks.agg(
      MisraGriesAgg.misraGries(col("term"), cap).as("sk"),
      count(col("term")).as("n")).collect()(0)
    val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val thr = row.getLong(1) / (cap + 1)
    toks.filter(col("term").isin(cands: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(thr))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
  }

  test("streamed merges == inline single pass; summary stays O(capacity)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hh_stream").toString
    HeavyHittersStream.seed(spark, s"$dir/store", capacity = 64)

    val d = graft.Tables.table(spark, sf001, "documents")
    val terms = docTokens(d).as[String].collect().toSeq
    // three uneven micro-batches — slicing must not matter
    val (a, rest) = terms.splitAt(terms.size / 5)
    val (b, c) = rest.splitAt(rest.size / 2)
    val in = MemoryStream[String]
    val q = HeavyHittersStream.streamTo(
      in.toDF().toDF("term"), "term", s"$dir/store", s"$dir/ckpt").start()
    try {
      in.addData(a: _*); q.processAllAvailable()
      in.addData(b: _*); q.processAllAvailable()
      in.addData(c: _*); q.processAllAvailable()
    } finally q.stop()

    val (summary, n, cap) = HeavyHittersStream.read(spark, s"$dir/store")
    assert(cap == 64 && summary.size <= 64)
    assert(n == terms.size.toLong, s"admitted count drifted: $n vs ${terms.size}")
    assert(served(s"$dir/store") == inline())
  }

  test("uncommitted versions are skipped and cleaned; commits supersede") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hh_crash").toString
    val store = s"$dir/store"
    HeavyHittersStream.seed(spark, store, capacity = 8)
    Seq.fill(10)("hot").toDF("t")
      .createOrReplaceTempView("hh_crash_batch")
    HeavyHittersStream.mergeBatch(
      spark.table("hh_crash_batch"), "t", store)
    // simulate a crash mid-write: items landed for v=99, meta never did
    Seq(("ghost", 5L)).toDF("term", "est").coalesce(1)
      .write.mode("overwrite").parquet(s"$store/v=99/items")
    val (summary, n, _) = HeavyHittersStream.read(spark, store)
    assert(summary == Map("hot" -> 10L) && n == 10L,
      s"uncommitted version leaked into a read: $summary")
    // the next commit cleans the debris and reads keep working
    HeavyHittersStream.mergeBatch(spark.table("hh_crash_batch"), "t", store)
    val (s2, n2, _) = HeavyHittersStream.read(spark, store)
    assert(s2 == Map("hot" -> 20L) && n2 == 20L)
    assert(!new java.io.File(s"$store/v=99").exists(),
      "crashed version debris not cleaned by the next commit")
  }

  test("reads refuse an unseeded store; capacity bound holds under churn") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hh_guard").toString
    intercept[IllegalArgumentException] {
      HeavyHittersStream.read(spark, s"$dir/none")
    }
    val store = s"$dir/store"
    HeavyHittersStream.seed(spark, store, capacity = 4)
    // singleton flood across two batches: summary can never exceed 4
    HeavyHittersStream.mergeBatch(
      (0 until 500).map(i => s"x$i").toDF("t"), "t", store)
    HeavyHittersStream.mergeBatch(
      ((0 until 500).map(i => s"y$i") ++ Seq.fill(300)("hot")).toDF("t"),
      "t", store)
    val (summary, n, _) = HeavyHittersStream.read(spark, store)
    assert(summary.size <= 4 && n == 1300L)
    assert(summary.contains("hot"), s"300/1300 > 1300/5 must survive: $summary")
  }
}
