package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
    val out = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("signBuckets is deterministic and lshTopK ranks within bucket") {
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val b1 = Similarity.signBuckets(e, "vec_id", "embedding", nBits = 4, dim = 64)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.signBuckets(e, "vec_id", "embedding", nBits = 4, dim = 64)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 1) // spreads across buckets

    val q = e.filter(col("vec_id") % 100 === 0)
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 3, nBits = 4, dim = 64)
      .collect()
    assert(approx.nonEmpty)
    // ranks are 1..k per query, no self-matches
    assert(approx.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
    assert(approx.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("ivfTopK is deterministic and overlaps brute force") {
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val r1 = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 3, nLists = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val r2 = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 3, nLists = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r1 == r2)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = r1.map(t => (t._1, t._3))
    assert((exact & approx).nonEmpty)
  }

  test("lshTopK recall vs brute force is nontrivial at nBits=4") {
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 3, nBits = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // single-probe sign-LSH at nBits=4 trades recall for a 16x candidate
    // cut; ~0.2-0.5 on these embeddings. Multi-probe raises it at scale.
    assert(recall >= 0.2, s"recall=$recall")

    val multi = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 3,
        nBits = 4, dim = 64, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallMulti = (exact & multi).size.toDouble / exact.size
    assert(recallMulti >= recall,
      s"multi-probe should not lose recall: $recallMulti < $recall")
    assert(recallMulti > 0.5, s"recallMulti=$recallMulti")
  }
}
