package graft.corpus

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CorpusOps.chunkTokens (boundaries, overlap, map-only plan) and
  * CorpusOps.pmiPairs (exact counts on a hand-built fixture, the
  * scale-relative df band and co-occurrence floor).
  */
class ChunkPmiSpec extends SparkSpec {

  test("chunk boundaries and overlap: window 4, stride 3") {
    val spark0 = spark
    import spark0.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val out = CorpusOps.chunkTokens(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
        window = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens", "chunk_text")
      .collect()
    // starts 0,3,6,9 -> chunks [1..4],[4..7],[7..10],[10]
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(out(0).getString(2) == "t1 t2 t3 t4")
    assert(out(1).getString(2) == "t4 t5 t6 t7", "one-token overlap at stride 3")
    assert(out(3).getString(2) == "t10")
  }

  test("short doc yields exactly one chunk; md5 matches the text hash") {
    val spark0 = spark
    import spark0.implicits._
    val out = CorpusOps.chunkTokens(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
        window = 64, stride = 40).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[String]("chunk_md5") ==
      java.security.MessageDigest.getInstance("MD5").digest("a b c".getBytes)
        .map("%02x".format(_)).mkString)
  }

  test("chunking is map-only: no shuffle exchange in the executed plan") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = CorpusOps.chunkTokens(df, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan
    assert(plan.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      "chunking must ride the scan — no join, no shuffle")
  }

  test("invalid window/stride rejected") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      CorpusOps.chunkTokens(df, "doc_id", "text", window = 2, stride = 3)
    }
  }

  test("pmiPairs: exact counts on a hand-built fixture") {
    val spark0 = spark
    import spark0.implicits._
    // 10 docs; 'x' in all 10 (df*10 <= 8*N fails: 100 > 80 -> banned);
    // a,b co-occur in 6 docs (floor 6*20 >= 10 passes); c rare with b
    val docs = (
      (1 to 6).map(i => (i.toLong, "a b filler" + i)) ++
      Seq((7L, "a c"), (8L, "b c"), (9L, "c d"), (10L, "a b"))
    ).map { case (id, t) => (id, t + " x") }.toDF("doc_id", "text")
    val out = CorpusOps.pmiPairs(docs, "doc_id", "text", topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a: docs 1-6,7,10 -> df 8 -> 80 <= 80 passes; b: 1-6,8,10 -> df 8
    // a&b co-occur in 1-6,10 -> cxy 7; floor: 7*20 >= 10 ok
    assert(out.contains(("a", "b")))
    val (cxy, dfa, dfb, pmi) = out(("a", "b"))
    assert(cxy == 7L && dfa == 8L && dfb == 8L)
    assert(pmi == 7L * 10L * 1000000L / (8L * 8L)) // 1093750
    assert(!out.keySet.exists(p => p._1 == "x" || p._2 == "x"),
      "ubiquitous token must be df-banned")
    // c pairs: c&a cxy=1 -> 20 < 10 docs*? 1*20 >= 10 passes! df c = 3 docs(7,8,9)
    assert(out.contains(("a", "c")) && out(("a", "c"))._1 == 1L)
  }

  test("pmiPairs: co-occurrence floor drops sub-5% pairs") {
    val spark0 = spark
    import spark0.implicits._
    // 40 docs: p,q co-occur once -> 1*20 < 40 -> dropped; a,p co-occur
    // in 9 docs -> 180 >= 40 -> kept (both inside the df band)
    val docs = ((1 to 9).map(i => (i.toLong, "p a"))
      ++ Seq((10L, "p q"))
      ++ (11 to 20).map(i => (i.toLong, "q b"))
      ++ (21 to 40).map(i => (i.toLong, s"filler$i"))).toDF("doc_id", "text")
    val out = CorpusOps.pmiPairs(docs, "doc_id", "text", topK = 100)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!out.contains(("p", "q")), "sub-5% co-occurrence must drop")
    assert(out.contains(("a", "p")))
  }
}
