package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClustersSpec extends SparkSpec {

  private def nodes(ids: Long*) = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("id_a", "id_b")
  }

  test("connectedComponents: transitive chain collapses to one min-id cluster") {
    val out = Clusters.connectedComponents(
        nodes(1L, 2L, 3L, 4L, 5L), "doc_id", edges((1L, 2L), (2L, 3L), (3L, 4L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
  }

  test("connectedComponents: multiple components and edge-order invariance") {
    val e1 = edges((10L, 11L), (12L, 13L), (11L, 14L))
    val e2 = edges((11L, 14L), (12L, 13L), (10L, 11L))
    val n = nodes(10L, 11L, 12L, 13L, 14L, 15L)
    val a = Clusters.connectedComponents(n, "doc_id", e1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Clusters.connectedComponents(n, "doc_id", e2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a == Map(10L -> 10L, 11L -> 10L, 14L -> 10L,
      12L -> 12L, 13L -> 12L, 15L -> 15L))
  }

  test("connectedComponents: empty node set returns an empty frame, no NPE") {
    import spark.implicits._
    val out = Clusters.connectedComponents(
      Seq.empty[Long].toDF("doc_id"), "doc_id", edges())
    assert(out.count() == 0)
  }

  test("connectedComponents: empty edge list yields all singletons") {
    val out = Clusters.connectedComponents(nodes(7L, 8L), "doc_id", edges())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 7L, 8L -> 8L))
  }

  test("connectedComponents: refuses to return unconverged labels") {
    // a 5-hop chain cannot converge in one round (min label moves one
    // hop per round); the operator must throw, never emit partial labels
    val chain = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    intercept[IllegalStateException] {
      Clusters.connectedComponents(
        nodes(1L, 2L, 3L, 4L, 5L, 6L), "doc_id", chain, maxIter = 1)
    }
  }

  test("pointer doubling converges a >30-diameter chain within default maxIter") {
    import spark.implicits._
    // an 80-hop chain: plain propagation moves the min label one hop per
    // round and would need 80 rounds (> default maxIter 30); with the
    // shortcut active past round 5 the remaining distance halves per
    // round, so the default parameters must converge
    val n = 81L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Clusters.connectedComponents(
        (0L until n).toDF("doc_id"), "doc_id", chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n.toInt)
    assert(out.values.forall(_ == 0L), out.toSeq.sortBy(_._1).take(10).toString)
    // without the shortcut the same chain must throw, not mislabel
    intercept[IllegalStateException] {
      Clusters.connectedComponents(
        (0L until n).toDF("doc_id"), "doc_id", chain,
        shortcutAfter = Int.MaxValue)
    }
  }

  test("reliable checkpointDir mode: same labels, checkpoint files on disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    // the operator must not leave the app-global checkpoint dir
    // repointed at its own directory
    val prevDir = java.nio.file.Files.createTempDirectory("cc_prev").toString
    spark.sparkContext.setCheckpointDir(prevDir)
    val out = Clusters.connectedComponents(
        nodes(1L, 2L, 3L, 4L, 5L), "doc_id",
        edges((1L, 2L), (2L, 3L), (3L, 4L)),
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
    // reliable checkpoints actually landed in the requested directory
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, s"no checkpoint files under $dir")
    // and the caller's checkpoint dir setting was restored
    assert(spark.sparkContext.getCheckpointDir.exists(_.contains("cc_prev")),
      spark.sparkContext.getCheckpointDir.toString)
  }

  test("connectedComponents matches a reference union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 30
      val es = Seq.fill(25)((rnd.nextInt(n), rnd.nextInt(n)))
        .filter(p => p._1 != p._2)
        .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
        .distinct
      // reference union-find: larger root always attaches under the
      // smaller, so each component's root IS its min id
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Clusters.connectedComponents(
          (0L until n.toLong).toDF("doc_id"), "doc_id", es.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"edges: $es")
    }
  }

  test("keepersByScore: best score wins, min id breaks ties, singletons survive") {
    import spark.implicits._
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "quality")
    val out = Clusters.keepersByScore(cc, scores, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 2 and 3 tie on 0.9 -> min id 2 keeps; singleton 9 keeps itself
    assert(out == Set((2L, 1L, 0.9), (9L, 9L, 0.1)))
  }

  test("nearDupIdsByCluster drops all but one member of each transitive group") {
    import spark.implicits._
    // 1~2 and 2~3 verify pairwise, 1~3 need not: the pairwise policy
    // would drop both 2 and 3; the cluster policy keeps the best member
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"),
      (4L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val dropped = graft.pipeline.TrainingDataPipeline
      .nearDupIdsByCluster(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(dropped.size == 2)              // exactly one of {1,2,3} survives
    assert(dropped.subsetOf(Set(1L, 2L, 3L)))
    assert(!dropped.contains(4L))          // the distinct doc is untouched
  }
}
