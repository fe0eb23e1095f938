package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank (q139): hand-computed ranks on a 3-node star,
  * bit-identical results under any partitioning (the integer-
  * arithmetic claim), and the fixed-point invariance of a symmetric
  * pair.
  */
class GraphSpec extends SparkSpec {

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int, parts: Int = 4) = {
    val spark0 = spark
    import spark0.implicits._
    Graph.fixedPointPageRank(edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // star: center 1 <-> leaves 2, 3 (symmetrized); deg(1)=2, deg(2)=deg(3)=1
  private val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))

  test("hand-computed star ranks after one and two rounds") {
    // r1(1) = 150000 + (1e6 + 1e6) * 85 div 100          = 1850000
    // r1(leaf) = 150000 + (1e6 div 2) * 85 div 100       = 575000
    assert(ranksOf(star, 1) ==
      Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    // r2(1) = 150000 + (575000 + 575000) * 85 div 100    = 1127500
    // r2(leaf) = 150000 + (1850000 div 2) * 85 div 100   = 936250
    assert(ranksOf(star, 2) ==
      Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("bit-identical under any partitioning") {
    val ref = ranksOf(star, 3, parts = 1)
    Seq(2, 7).foreach(p => assert(ranksOf(star, 3, parts = p) == ref))
  }

  test("a symmetric pair is a fixed point (mass neither created nor lost)") {
    // two nodes, each the other's only neighbor: rank stays 1e6 forever
    val pair = Seq((1L, 2L), (2L, 1L))
    assert(ranksOf(pair, 4) == Map(1L -> 1000000L, 2L -> 1000000L))
  }
}
