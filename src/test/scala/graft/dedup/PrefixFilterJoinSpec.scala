package graft.dedup

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** Dedup.prefixFilterJoin: the prefix-filter theorem proven against
  * brute force — the prefix-joined candidates must recover EVERY pair
  * at the Jaccard threshold — plus soundness, threshold boundary
  * behavior, and the no-cartesian plan shape.
  */
class PrefixFilterJoinSpec extends SparkSpec {

  // brute-force ground truth over distinct 3-shingle sets
  private def shingleSet(text: String): Set[String] = {
    val w = text.trim.split("\\s+").toSeq
    if (w.size < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  private def brute(docs: Seq[(Long, String)], p: Int, q: Int) = {
    for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      c = (sa & sb).size
      if sa.nonEmpty && sb.nonEmpty && c * q >= (sa.size + sb.size - c) * p
    } yield (ia, ib, c.toLong, sa.size.toLong, sb.size.toLong)
  }.toSet

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",   // high overlap w/ 1
    3L -> "the quick brown fox jumps over the lazy dog",   // identical to 1
    4L -> "a completely different sentence about spark engines",
    5L -> "a completely different sentence about spark planes",
    6L -> "the quick brown fox jumps over a lazy dog today",
    7L -> "short doc",                                      // no 3-shingles
    8L -> "one two three four five six seven eight nine ten",
    9L -> "one two three four five six seven eight nine ten",
    10L -> "ten nine eight seven six five four three two one"
  )

  test("complete AND sound vs brute force at t = 0.8") {
    val spark0 = spark
    import spark0.implicits._
    val out = Dedup.prefixFilterJoin(docs.toDF("doc_id", "text"),
        "doc_id", "text", p = 8, q = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == brute(docs, 8, 10),
      s"prefix join=${out.toSeq.sorted} brute=${brute(docs, 8, 10).toSeq.sorted}")
    // sanity on the fixture itself: identical docs pair at J=1
    assert(out.exists(t => t._1 == 1L && t._2 == 3L))
    assert(out.exists(t => t._1 == 8L && t._2 == 9L))
  }

  test("threshold sweeps stay complete (the theorem, not a lucky fixture)") {
    val spark0 = spark
    import spark0.implicits._
    val df = docs.toDF("doc_id", "text")
    for ((p, q) <- Seq((1, 2), (7, 10), (9, 10), (10, 10))) {
      val out = Dedup.prefixFilterJoin(df, "doc_id", "text", p, q)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(out == brute(docs, p, q), s"divergence at t=$p/$q")
    }
  }

  test("plan never degrades to cartesian/BNLJ; bad thresholds rejected") {
    val spark0 = spark
    import spark0.implicits._
    val out = Dedup.prefixFilterJoin(docs.toDF("doc_id", "text"),
      "doc_id", "text", 8, 10)
    val plan = out.queryExecution.executedPlan
    assert(plan.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }.isEmpty)
    intercept[IllegalArgumentException] {
      Dedup.prefixFilterJoin(docs.toDF("doc_id", "text"), "doc_id", "text", 11, 10)
    }
  }
}
