package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Similarity.labelCentroidOutliers: hand-checked geometry, the
  * cnt^2-scaling invariance claim (ranking equals true centroid
  * distance ranking), and integer exactness of the quantization.
  */
class CentroidOutliersSpec extends SparkSpec {

  test("farthest-from-centroid ranks first; scaling matches cnt^2 * d^2") {
    val spark0 = spark
    import spark0.implicits._
    // label 0: three 2-d vectors; centroid of q-units = mean of
    // (1000,0),(0,1000),(2000,2000) = (1000,1000)
    // d2 (q-units): a:(0,-1000)->1e6; b:(-1000,0)->1e6; c:(1000,1000)->2e6
    // d2s = cnt^2 * d2 with cnt=3 -> 9e6, 9e6, 18e6
    val vecs = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0),
      (3L, Array(2f, 2f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidOutliers(vecs, "vec_id", "embedding", "label")
      .orderBy("rn").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 1L, 2L),
      "ties (1,2) break by vec_id")
    assert(out.map(_.getLong(2)).toSeq == Seq(18000000L, 9000000L, 9000000L))
  }

  test("labels are independent; topK caps each label") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = ((1 to 20).map(i => (i.toLong, Array(i.toFloat, 0f), 0)) ++
      (21 to 40).map(i => (i.toLong, Array(0f, i.toFloat), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidOutliers(vecs, "vec_id", "embedding", "label", topK = 5)
    val byLabel = out.collect().groupBy(_.getInt(1))
    assert(byLabel.keySet == Set(0, 1))
    assert(byLabel.values.forall(_.length == 5))
    // extremes of the 1..20 line are the outliers of label 0
    assert(byLabel(0).map(_.getLong(0)).contains(20L))
    assert(byLabel(0).map(_.getLong(0)).contains(1L))
  }

  test("embeddingDrift: identical halves drift 0; a shifted half drifts by the shift") {
    val spark0 = spark
    import spark0.implicits._
    // part 0 and part 1 identical -> means equal -> drift 0
    val same = Seq(
      (1L, Array(0.5f, -0.25f), 0, 0), (2L, Array(0.5f, -0.25f), 0, 1),
      (3L, Array(1.0f, 2.0f), 0, 0), (4L, Array(1.0f, 2.0f), 0, 1)
    ).toDF("vec_id", "embedding", "label", "part")
    val d0 = Similarity.embeddingDrift(same, "vec_id", "embedding", "label", "part")
      .collect().head
    assert(d0.getLong(3) == 0L)
    // part 1 shifted +0.1 in dim 1 only: mean micro diff = 100000 -> d2 = 1e10
    val shifted = Seq(
      (1L, Array(0.5f, 0.5f), 0, 0),
      (2L, Array(0.6f, 0.5f), 0, 1)
    ).toDF("vec_id", "embedding", "label", "part")
    val d1 = Similarity.embeddingDrift(shifted, "vec_id", "embedding", "label", "part")
      .collect().head
    assert(d1.getLong(3) == 100000L * 100000L, s"got ${d1.getLong(3)}")
    assert(d1.getLong(1) == 1L && d1.getLong(2) == 1L)
  }

  test("embeddingDrift: components outside the +-4.096 domain fail loudly") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq((1L, Array(9.9f), 0, 0), (2L, Array(0.1f), 0, 1))
      .toDF("vec_id", "embedding", "label", "part")
    val e = intercept[Exception] {
      Similarity.embeddingDrift(bad, "vec_id", "embedding", "label", "part").collect()
    }
    assert(e.getMessage != null)
  }

  test("quantization is exact: float*1000 never rounds (24-bit mantissa * 10 bits < 53)") {
    val spark0 = spark
    import spark0.implicits._
    // adversarial float values: denormal-ish fractions that are exact
    // in float; their *1000 must round half-away identically everywhere
    val vecs = Seq(
      (1L, Array(0.0078125f, -0.0078125f), 0), // 1/128 -> 7.8125 -> 8 / -8
      (2L, Array(0.5f, -1.5f), 0)              // 500, -1500
    ).toDF("vec_id", "embedding", "label")
    val q = vecs.select(posexplode(col("embedding")).as(Seq("p", "v")))
      .select(round(col("v").cast("double") * 1000).cast("long").as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(q == Seq(8L, -8L, 500L, -1500L))
  }

  test("centroidPairDistances: hand geometry, shift cancellation, a<b once") {
    val spark0 = spark
    import spark0.implicits._
    // label 0 centroid = mean((1,0), (3,0)) = (2, 0)
    // label 1 centroid = (0, 1); label 2 centroid = (-2, 0) (negative
    // components — the +4096 shift must cancel in every difference)
    val vecs = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(3f, 0f), 0),
      (3L, Array(0f, 1f), 1),
      (4L, Array(-2f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidPairDistances(vecs, "embedding", "label")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // micro-unit means: (2e6, 0), (0, 1e6), (-2e6, 0)
    assert(got == Map(
      (0, 1) -> (4000000L * 1000000L + 1000000L * 1000000L),
      (0, 2) -> (4000000L * 4000000L),
      (1, 2) -> (2000000L * 2000000L + 1000000L * 1000000L)))
    // every unordered pair appears exactly once, as label_a < label_b
    assert(got.keySet.forall { case (a, b) => a < b } && got.size == 3)
  }
}
