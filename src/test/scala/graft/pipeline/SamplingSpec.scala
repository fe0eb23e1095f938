package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("withSplit is partition-invariant and roughly the requested fraction") {
    val d = graft.Tables.table(spark, sf001, "documents")
    val a = Sampling.withSplit(d, "doc_id", 0.2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.withSplit(d.repartition(7), "doc_id", 0.2)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // assignment follows from the id, not the layout
    val testFrac = a.values.count(_ == "test").toDouble / a.size
    assert(testFrac > 0.1 && testFrac < 0.3, s"test fraction $testFrac")
  }

  test("mixSources tags each source and respects per-source rates") {
    import spark.implicits._
    val a = (1L to 200L).toDF("id")
    val b = (201L to 400L).toDF("id")
    val mixed = Sampling.mixSources(Seq(("a", a, 1.0), ("b", b, 0.0)), "id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(mixed.length == 200 && mixed.forall(_._2 == "a"))
    val half = Sampling.mixSources(Seq(("a", a, 0.5), ("b", b, 0.5)), "id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byTag = half.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byTag.keySet == Set("a", "b"))
    assert(byTag.values.forall(n => n > 60 && n < 140)) // ~100 each
  }

  test("edge fractions: 0.0 selects nothing, 1.0 selects everything") {
    import spark.implicits._
    val d = (1L to 100L).toDF("id")
    assert(d.filter(Sampling.inSlice(col("id"), 0.0)).count() == 0)
    assert(d.filter(Sampling.inSlice(col("id"), 1.0)).count() == 100)
  }
}
