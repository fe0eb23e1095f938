package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextRetrievalSpec extends SparkSpec {

  test("bm25TopK: term matches rank above non-matches, tf and length behave, self excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple banana"),          // higher tf for "apple"
      (3L, "apple " + ("filler " * 40).trim), // long doc: length-normalized down
      (4L, "durian elderberry fig")        // no query terms -> no row at all
    ).toDF("doc_id", "text")
    val q = Seq((100L, "apple")).toDF("doc_id", "text")
    val out = TextRetrieval.bm25TopK(
        docs, "doc_id", "text", q, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall(_._1 == 100L))
    // only docs containing at least one query term score
    assert(out.map(_._3).toSet == Set(1L, 2L, 3L))
    val rankOf = out.map(t => t._3 -> t._2).toMap
    // same length, higher tf wins; the 41-token doc is normalized below both
    assert(rankOf(2L) < rankOf(1L))
    assert(rankOf(3L) > rankOf(2L) && rankOf(3L) > rankOf(1L))
  }

  test("bm25TopK on testdata: valid rank shape, deterministic, self excluded (q102's contract)") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val queries = d.filter(col("doc_id") % 100 === 0)
    def run() = TextRetrieval.bm25TopK(
        d, "doc_id", "text", queries, "doc_id", "text",
        k = 5, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run(); val b = run()
    assert(a.toSet == b.toSet)
    assert(a.nonEmpty)
    assert(a.forall { case (q, r, doc) => r >= 1 && r <= 5 && q != doc })
    // each query's ranks are dense from 1
    a.groupBy(_._1).foreach { case (_, rows) =>
      val ranks = rows.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.max), ranks.toString)
    }
  }

  test("hybridRrfTopK: agreement outranks single-list hits; equals hand-computed RRF on testdata") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val queries = d.filter(col("doc_id") % 100 === 0)
    val fused = TextRetrieval.hybridRrfTopK(
        d, "doc_id", "text", queries, "doc_id", "text",
        k = 5, poolK = 20, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fused.nonEmpty)
    // hand-compute the fusion from the two public input rankings
    val a = TextRetrieval.bm25TopK(d, "doc_id", "text", queries, "doc_id", "text",
        k = 20, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val b = TextRetrieval.overlapTopK(d, "doc_id", "text", queries, "doc_id", "text",
        k = 20, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val expected = (a.keySet ++ b.keySet).toSeq
      .map { key =>
        val s = a.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          b.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (key._1, key._2, s)
      }
      .groupBy(_._1)
      .flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((_, doc, _), i) => (q, (i + 1).toLong, doc) }
      }.toSet
    assert(fused.toSet == expected)
  }

  test("retrieval plans stay equi-join only — no nested loop, no cartesian") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val queries = d.filter(col("doc_id") % 100 === 0)
    Seq(
      TextRetrieval.bm25TopK(d, "doc_id", "text", queries, "doc_id", "text",
        k = 5, excludeSelf = true),
      TextRetrieval.hybridRrfTopK(d, "doc_id", "text", queries, "doc_id", "text",
        k = 5, excludeSelf = true)
    ).foreach { df =>
      // the ONE allowed nested-loop shape is the broadcast scalar
      // attach of the N/avgdl statistics row (crossJoin(broadcast(g)) —
      // a single-row aggregate build side, the repo-wide scalar-attach
      // pattern): it multiplies nothing. Any OTHER nested loop — a
      // data-sized build side — is the accidental-cartesian hazard this
      // spec exists to reject, so count and inspect rather than ban.
      // AdaptiveSparkPlanExec is a leaf to collect() — unwrap it so the
      // traversal sees the actual operator tree
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val bnl = exec.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }
      assert(bnl.size <= 1, exec.toString)
      bnl.foreach { j =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          case _ => j.left
        }
        // the build side must be the one-row global-statistics aggregate
        val isScalarAgg = build.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
              if a.groupingExpressions.isEmpty => a
        }.isDefined
        assert(isScalarAgg,
          s"nested-loop build side is not a one-row scalar aggregate:\n$build")
      }
      assert(!exec.toString.contains("CartesianProduct"), exec.toString)
    }
  }

  test("maxPostings drops saturated terms: a term in every doc stops matching") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"common unique$i")).toDF("doc_id", "text")
    val q = Seq((99L, "common")).toDF("doc_id", "text")
    val unlimited = TextRetrieval.bm25TopK(
      docs, "doc_id", "text", q, "doc_id", "text", k = 5)
    assert(unlimited.count() == 5)
    val capped = TextRetrieval.bm25TopK(
      docs, "doc_id", "text", q, "doc_id", "text", k = 5, maxPostings = 10)
    assert(capped.count() == 0)
  }
}
