package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.functions.TextFunctions

class CountMinStreamSpec extends SparkSpec {

  private def docTokens(dd: org.apache.spark.sql.DataFrame) =
    dd.select(explode(TextFunctions.words(col("text"))).as("term"))

  test("streamed merges are BIT-IDENTICAL to the one-pass sketch; slicing never matters") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cm_stream").toString
    CountMinStream.seed(spark, s"$dir/store",
      eps = 0.001, confidence = 0.99, sketchSeed = 42)

    val d = graft.Tables.table(spark, sf001, "documents")
    val terms = docTokens(d).as[String].collect().toSeq
    // three uneven micro-batches through the streaming writer
    val (a, rest) = terms.splitAt(terms.size / 5)
    val (b, c) = rest.splitAt(rest.size / 2)
    val in = MemoryStream[String]
    val q = CountMinStream.streamTo(
      in.toDF().toDF("term"), "term", s"$dir/store", s"$dir/ckpt").start()
    try {
      in.addData(a: _*); q.processAllAvailable()
      in.addData(b: _*); q.processAllAvailable()
      in.addData(c: _*); q.processAllAvailable()
    } finally q.stop()

    val (stored, eps, conf, seed) = CountMinStream.read(spark, s"$dir/store")
    assert((eps, conf, seed) == ((0.001, 0.99, 42)))
    assert(stored.totalCount() == terms.size.toLong)
    // the parity claim q142 rests on: merged counters == one-pass counters
    val onePass = docTokens(d).agg(count_min_sketch(
      col("term"), lit(0.001), lit(0.99), lit(42))).collect()(0)
      .getAs[Array[Byte]](0)
    val storedBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      stored.writeTo(bos); bos.toByteArray
    }
    assert(java.util.Arrays.equals(storedBytes, onePass),
      "streamed-merged sketch diverged from the single-pass sketch")
  }

  test("uncommitted versions are skipped and cleaned; commits supersede") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cm_crash").toString
    val store = s"$dir/store"
    CountMinStream.seed(spark, store, 0.01, 0.9, 7)
    CountMinStream.mergeBatch(Seq.fill(10)("hot").toDF("t"), "t", store)
    // crash mid-write: sketch landed for v=99, meta (the commit) never did
    Seq(Array[Byte](1, 2, 3)).toDF("sketch").coalesce(1)
      .write.mode("overwrite").parquet(s"$store/v=99/sketch")
    val (sk, _, _, _) = CountMinStream.read(spark, store)
    assert(sk.totalCount() == 10L && sk.estimateCount("hot") == 10L,
      "uncommitted version leaked into a read")
    CountMinStream.mergeBatch(Seq.fill(5)("hot").toDF("t"), "t", store)
    val (sk2, _, _, _) = CountMinStream.read(spark, store)
    assert(sk2.totalCount() == 15L && sk2.estimateCount("hot") == 15L)
    assert(!new java.io.File(s"$store/v=99").exists(),
      "crashed version debris not cleaned by the next commit")
  }

  test("reads refuse an unseeded store; estimates gate holds on the served face") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cm_guard").toString
    intercept[IllegalArgumentException] {
      CountMinStream.read(spark, s"$dir/none")
    }
    val store = s"$dir/store"
    CountMinStream.seed(spark, store, 0.01, 0.99, 42)
    val corpus = (Seq.fill(100)("a") ++ Seq.fill(40)("b") ++
      (0 until 800).map(i => s"z$i")).toDF("t")
    CountMinStream.mergeBatch(corpus, "t", store)
    val out = CountMinStream.estimates(
        spark, store, corpus, "t", Seq("a", "b").toDF("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSet == Set(("a", 100L, true), ("b", 40L, true)), out.toSeq)
  }
}
