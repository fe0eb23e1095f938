package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.SparkSpec

/** q137's gating assumptions, pinned on crafted fixtures: the built-in
  * count_min_sketch aggregate must (a) merge to a BIT-IDENTICAL
  * serialized sketch under any partitioning (counters are sums), (b)
  * never undercount, (c) overcount by at most ceil(eps*N), and (d) add
  * string values through the same UTF-8-bytes hash that driver-side
  * `estimateCount(String)` reads — (d) is the cross-API seam the gate
  * silently depends on.
  */
class CountMinSpec extends SparkSpec {

  private def sketchRow(df: org.apache.spark.sql.DataFrame, eps: Double) =
    df.agg(
      count_min_sketch(col("term"), lit(eps), lit(0.99), lit(42)).as("sk"),
      count(lit(1)).as("n")).collect()(0)

  test("merged sketch bytes are identical across partitionings") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq.fill(300)("hot") ++ (0 until 2000).map(i => s"cold-$i")
    val reference = sketchRow(rows.toDF("term").repartition(1), eps = 0.01)
      .getAs[Array[Byte]](0)
    Seq(3, 16).foreach { p =>
      val b = sketchRow(rows.toDF("term").repartition(p), eps = 0.01)
        .getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(reference, b),
        s"p=$p produced different sketch bytes — merge is not exact")
    }
  }

  test("never undercounts; overcount within ceil(eps*N) on a collision-heavy stream") {
    val spark0 = spark
    import spark0.implicits._
    // eps 0.01 -> narrow width, 5000 distinct singletons force collisions
    val truth = Map("a" -> 500L, "b" -> 200L, "c" -> 1L)
    val rows = truth.toSeq.flatMap { case (t, n) => Seq.fill(n.toInt)(t) } ++
      (0 until 5000).map(i => s"x-$i")
    val row = sketchRow(rows.toDF("term").repartition(8), eps = 0.01)
    val cms = CountMinSketch.readFrom(row.getAs[Array[Byte]](0))
    val bound = math.ceil(0.01 * row.getLong(1)).toLong
    truth.foreach { case (t, exact) =>
      val est = cms.estimateCount(t)
      assert(est >= exact, s"CM undercounted '$t': est=$est exact=$exact")
      assert(est <= exact + bound,
        s"CM overcount for '$t' beyond eps*N: est=$est exact=$exact bound=$bound")
    }
  }

  test("SQL-agg string adds and estimateCount(String) share the UTF-8 hash path") {
    val spark0 = spark
    import spark0.implicits._
    // wide sketch (eps 0.001) + tiny stream -> no collisions, so the
    // estimate is EXACT iff both APIs hash the same bytes; the non-ASCII
    // term pins the UTF-8 (not default-charset/UTF-16) encoding choice
    val rows = Seq.fill(7)("hello") ++ Seq.fill(3)("héllo") ++ Seq("z")
    val row = sketchRow(rows.toDF("term"), eps = 0.001)
    val cms = CountMinSketch.readFrom(row.getAs[Array[Byte]](0))
    assert(cms.estimateCount("hello") == 7L)
    assert(cms.estimateCount("héllo") == 3L)
    assert(cms.estimateCount("absent") == 0L)
  }
}
