package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity gate for the r18 single-pass PQ kernels: the codegen'd
  * encode/LUT/ADC kernels ([[graft.functions.PqEncodeCodes]],
  * [[graft.functions.PqLutFlat]], [[graft.functions.PqAdcDistance]])
  * replaced the explode-join-reaggregate formulations on every PQ hot
  * path, so this spec pins them VALUE-FOR-VALUE against the original
  * row-level definitions ([[Similarity.pqEncode]]/[[Similarity.pqLut]])
  * over real testdata — any divergence in distance arithmetic, argmin
  * tie-break, or subspace packing order fails here before it can reach
  * an oracle. */
class PqKernelParitySpec extends SparkSpec {
  private val m = 8
  private val dim = 64
  private val kCent = 16

  private def fixtures = {
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val (mns, mxs) = Similarity.sq8Ranges(e, "embedding")
    val codebook = Similarity.pqCodebook(
      e, "vec_id", "embedding", m, dim, kCent, mns, mxs)
    (e, mns, mxs, codebook)
  }

  test("pqCodesColumn == pqEncode packed codes, row for row") {
    val (e, mns, mxs, codebook) = fixtures
    val cb = Similarity.collectedCodebook(codebook, m)
    val fast = e.select(col("vec_id"),
        Similarity.pqCodesColumn(
          graft.functions.Sq8Quantize.sq8Quantize(col("embedding"), mns, mxs),
          cb, dim).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val ref = Similarity.pqEncode(e, "vec_id", "embedding", codebook, m, dim, mns, mxs)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("code")))).as("sc"))
      .select(col("vec_id"), expr("transform(sc, x -> x.code)").as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(fast.size == ref.size && fast.nonEmpty)
    assert(fast == ref)
  }

  test("pqLutFlatColumn[s * kCent + j] == pqLut's (s, j, d) rows") {
    val (e, mns, mxs, codebook) = fixtures
    val q = e.filter(col("vec_id") % 100 === 0)
    val cb = Similarity.collectedCodebook(codebook, m)
    val flat = q.select(col("vec_id"),
        Similarity.pqLutFlatColumn(
          graft.functions.Sq8Quantize.sq8Quantize(col("embedding"), mns, mxs),
          cb, dim).as("dflat"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ref = Similarity.pqLut(q, "vec_id", "embedding", codebook, m, dim, mns, mxs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(ref.size == flat.size * m * kCent)
    ref.foreach { case ((qid, s, j), d) =>
      assert(flat(qid)((s * kCent + j).toInt) == d,
        s"LUT mismatch at query=$qid s=$s j=$j")
    }
  }

  test("adcDistColumn == LUT-join + sum(d): full pqTopK parity on testdata") {
    val (e, mns, mxs, codebook) = fixtures
    val q = e.filter(col("vec_id") % 100 === 0)
    // the shipped (kernel) path
    val fast = Similarity.pqTopK(e, q, "vec_id", "embedding",
        k = 5, m = m, dim = dim, kCent = kCent)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the original explode-join-reaggregate formulation, inline
    val codes = Similarity.pqEncode(
      e.select(col("vec_id").as("neighbor_id"), col("embedding")),
      "neighbor_id", "embedding", codebook, m, dim, mns, mxs)
    val lut = Similarity.pqLut(q, "vec_id", "embedding", codebook, m, dim, mns, mxs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))
    val ref = codes
      .join(broadcast(lut), col("s") === col("ls") && col("code") === col("lj"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("d")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fast.nonEmpty)
    assert(fast.toSet == ref.toSet)
  }
}
