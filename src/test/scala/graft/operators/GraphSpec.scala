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

  private def trianglesOf(edges: Seq[(Long, Long)], parts: Int = 4) = {
    val spark0 = spark
    import spark0.implicits._
    Graph.triangleCounts(edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangles: K4 gives every node 3; a pendant and an open wedge give none") {
    // K4 on 1-4 (each node in C(3,2)=3 triangles), pendant 5-1,
    // open wedge 6-7, 7-8 (no closing edge)
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = k4 ++ Seq((5L, 1L), (6L, 7L), (7L, 8L))
    val got = trianglesOf(edges)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
  }

  test("triangles: orientation, duplicates, and partitioning do not change counts") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L)) // one triangle
    val messy = base ++ base.map(_.swap) ++ Seq((2L, 1L), (1L, 2L)) // dups + both orientations
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    assert(trianglesOf(base) == expected)
    assert(trianglesOf(messy) == expected)
    Seq(1, 8).foreach(p => assert(trianglesOf(messy, p) == expected))
  }

  test("reliable checkpointDir path is bit-identical for both operators") {
    // the knob only changes WHERE lineage is pinned (shared-FS blocks
    // vs executor blocks) — the integer designs make the outputs exact,
    // so reliable == local must hold bit-for-bit
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graph-ckpt").toString
    val edges = (star ++ Seq((2L, 3L), (3L, 2L))).toDF("src", "dst")
    try {
      val prLocal = Graph.fixedPointPageRank(edges, 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prReliable = Graph.fixedPointPageRank(edges, 3, Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prReliable == prLocal)
      val triLocal = Graph.triangleCounts(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val triReliable = Graph.triangleCounts(edges, Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(triReliable == triLocal)
      // the reliable run actually wrote checkpoint data to the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files landed under $dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("checkpointDir runs restore the caller's application-global checkpoint dir") {
    // setCheckpointDir is SparkContext-global: an operator that leaves
    // its own dir behind silently repoints every later .checkpoint()
    // in the app. Same convention as Clusters.connectedComponents.
    val spark0 = spark
    import spark0.implicits._
    val sc = spark.sparkContext
    val callerDir = java.nio.file.Files.createTempDirectory("caller-ckpt").toString
    val opDir = java.nio.file.Files.createTempDirectory("op-ckpt").toString
    val prevAtStart = sc.getCheckpointDir
    try {
      sc.setCheckpointDir(callerDir)
      // setCheckpointDir appends a fresh UUID level each call, so
      // restore cannot be exact-equal — the contract is that later
      // .checkpoint()s still land under the CALLER'S directory tree
      val callerSet = sc.getCheckpointDir.get // fs-qualified callerDir/UUID
      def underCaller = sc.getCheckpointDir.exists(_.contains(callerDir
        .stripPrefix("/"))) && !sc.getCheckpointDir.exists(_.contains(opDir
        .stripPrefix("/")))
      assert(callerSet.contains(callerDir.stripPrefix("/")))
      val edges = (star ++ Seq((2L, 3L), (3L, 2L))).toDF("src", "dst")
      Graph.fixedPointPageRank(edges, 2, Some(opDir)).count()
      assert(underCaller,
        s"pageRank leaked its checkpoint dir: ${sc.getCheckpointDir}")
      Graph.triangleCounts(edges, Some(opDir)).count()
      assert(underCaller,
        s"triangleCounts leaked its checkpoint dir: ${sc.getCheckpointDir}")
    } finally {
      prevAtStart.foreach(sc.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(callerDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(opDir))
    }
  }

  test("triangles: hub-heavy graph matches naive enumeration") {
    // hub 0 connected to 1..10, plus ring edges i-(i+1): triangles are
    // exactly (0, i, i+1) — verify against a driver-side naive count
    val edges = (1L to 10L).map(h => (0L, h)) ++
      (1L until 10L).map(i => (i, i + 1))
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      x <- nodes; y <- nodes if x < y; z <- nodes if y < z
      if es((x, y)) && es((y, z)) && es((x, z))
    } Seq(x, y, z).foreach(n => naive(n) += 1)
    assert(trianglesOf(edges) == naive.toMap)
  }
}
