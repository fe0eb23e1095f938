package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics as plain join-aggregate rounds — the
  * link-graph importance signal a web-scale curation pipeline derives
  * before quality filtering (PageRank over the crawl graph is the
  * classic prior; here the same iteration over any edge list).
  *
  * Determinism design: ranks are FIXED-POINT integers (micro-units,
  * BIGINT), every per-edge contribution is an integer division and the
  * damping step is `(sum * 85) div 100` — all operations exact and
  * associative, so the result is bit-identical under any partitioning,
  * any merge order, and in any engine that implements integer division.
  * (Float PageRank would make the oracle hash a summation-order
  * lottery; the integer formulation trades <= 1 micro-unit of rounding
  * per in-edge for exactness. The rounded-away mass is NOT
  * redistributed — documented, identical on both sides.)
  *
  * Scale shape (100 TB): each round is one shuffle — edges join ranks
  * on `src` (both sides hash-partitioned on the same key, so
  * consecutive rounds reuse the edge partitioning), then a partial-agg
  * `groupBy(dst)` whose map-side combine bounds shuffle volume by the
  * dst-degree distribution, with AQE handling hub skew. Edges+degree
  * are computed once and persisted across rounds; iteration count is a
  * fixed small constant, so plan growth stays bounded without
  * checkpointing.
  */
object Graph {

  /** Lineage pin for the iterative materializations here. Default is
    * `localCheckpoint` — executor-block storage, zero external
    * dependencies, right for the fixed-small-iteration shapes below on
    * a healthy cluster. Pass `checkpointDir` for the RELIABLE variant
    * (same knob as [[graft.dedup.Clusters.connectedComponents]]):
    * blocks land on the shared filesystem, so losing an executor
    * mid-computation recomputes from the checkpoint instead of killing
    * the job — the trade every long-running production graph job makes.
    * Output is bit-identical either way: the integer formulations are
    * exact under any partitioning, and a checkpoint only pins lineage.
    *
    * setCheckpointDir is application-global state; the caller's setting
    * is captured before and restored after the eager checkpoint (same
    * convention and same CONCURRENCY CONTRACT as
    * [[graft.dedup.Clusters.connectedComponents]]: only safe when no
    * other job on this context calls .checkpoint() concurrently —
    * concurrent callers should set the dir once at startup and pass
    * that same value here, a no-op race). If no dir was set before,
    * ours necessarily remains — Spark has no unset.
    */
  private def pinLineage(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        val prevCheckpointDir = sc.getCheckpointDir
        sc.setCheckpointDir(dir)
        try df.checkpoint(eager = true)
        finally prevCheckpointDir.foreach(sc.setCheckpointDir)
      case None => df.localCheckpoint(eager = true)
    }

  /** `iters` rounds of damped fixed-point PageRank over `edges`
    * (columns `src`, `dst`; every node must appear as a `dst` at least
    * once per round to keep a rank — guaranteed for symmetrized edge
    * lists, which is the intended input). Initial rank is 1_000_000
    * micro-units per node; each round:
    * `rank'(v) = 150000 + 85% * sum_{(u,v) in E} rank(u) div deg(u)`.
    * `checkpointDir` opts the round loop into reliable checkpoints
    * ([[pinLineage]]); identical ranks by the integer design.
    */
  def fixedPointPageRank(
      edges: DataFrame, iters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = edges.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1000000L))
      (1 to iters).foreach { _ =>
        // names are disjoint across the two sides (src/dst/deg vs
        // node/pr), so resolve by name — dataframe-apply refs would
        // hit self-join lineage ambiguity after the first round
        ranks = edgesDeg
          .join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("pr div deg").as("contrib"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("s"))
          .select(col("dst").as("node"),
            expr("150000L + (s * 85L) div 100L").as("pr"))
      }
      // materialize before unpersisting the edge frame the plan reads
      pinLineage(ranks, checkpointDir)
    } finally edgesDeg.unpersist()
  }

  /** Per-node triangle counts over an undirected edge list (`src`,
    * `dst`, any orientation/duplication — canonicalized here). The
    * count is exact and integer, so the oracle can re-derive it with
    * the naive a<b<c three-way self-join; this implementation instead
    * ORIENTS each edge from its lower-(degree, id) endpoint to the
    * higher one (Suri & Vassilvitskii's MR trick, public recipe):
    * every triangle is then enumerated exactly once from its
    * lowest-ordered vertex, and wedge fan-out per node is bounded by
    * the ORIENTED out-degree — O(sqrt(m)) — instead of the raw degree,
    * which is the difference between a hub node exploding the wedge
    * join and not, at 100 TB. Three hash joins, no cartesian.
    * `checkpointDir` opts the two edge-set materializations into
    * reliable checkpoints ([[pinLineage]]); identical counts (exact
    * integers under any partitioning).
    */
  def triangleCounts(
      edges: DataFrame, checkpointDir: Option[String] = None): DataFrame = {
    // materialize the canonical edge set ONCE: it feeds four plan
    // branches (degree union x2, the rank join, the closing-edge side),
    // and edge construction is typically an expensive upstream join —
    // as a lazy lineage each branch re-runs it (measured 7.8s -> 4.0s
    // at sf0.1 on the q143 co-purchase graph). Bounded by |E|; the
    // cluster-scale analog is persisting the edge list before the
    // triangle pass, which every production graph pipeline does.
    val canon = pinLineage(edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct(), checkpointDir)
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lower endpoint in that total order points
    // at the higher — rank surrogate = deg * 2^40 + id keeps one
    // BIGINT compare in codegen (ids are far below 2^40 here; at wider
    // id domains compare the pair lexicographically instead)
    // (measured: forcing broadcast on these two |V|-sized joins is ~2x
    // SLOWER here than letting AQE pick — the eager checkpoint below
    // serializes both broadcast builds; leave the planner free)
    val ranked = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
      .select(col("a"), col("b"),
        (col("da") * lit(1099511627776L) + col("a")).as("ra"),
        (col("db") * lit(1099511627776L) + col("b")).as("rb"))
    // materialize the ORIENTED edges too: three consumers below (both
    // wedge sides + the closing-edge probe) would each re-run the two
    // degree joins above as lazy lineage — same argument as `canon`,
    // same |E| bound
    val oriented = pinLineage(ranked.select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("lo"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("hi"),
        when(col("ra") < col("rb"), col("rb")).otherwise(col("ra")).as("rhi")),
      checkpointDir)
    // wedges from each low vertex: pairs of its out-neighbors, ordered
    // by rank so (v, w) matches the orientation of a closing edge v->w
    val o1 = oriented.select(col("lo").as("u"), col("hi").as("v"), col("rhi").as("rv"))
    val o2 = oriented.select(col("lo").as("u"), col("hi").as("w"), col("rhi").as("rw"))
    val closing = oriented.select(col("lo").as("v"), col("hi").as("w"))
    // Bloom-prefilter the wedge stream BEFORE its (v, w) exchange
    // (optimization-guide §3.2): wedge fan-out is quadratic in oriented
    // out-degree while closing edges are only |E|, so most wedges never
    // close — without the filter every one of them pays the shuffle to
    // the closing join (44M rows at sf0.1 vs 2.3M edges). The sketch is
    // built over the closing side's xxhash64(v, w) in one |E| pass off
    // the checkpoint (the count sizes it exactly), probes map-side
    // inside the wedge join's codegen span, and can only pass false
    // POSITIVES — the exact (v, w) join still decides every triangle,
    // so counts are unchanged by construction.
    val nEdges = math.max(oriented.count(), 1L)
    val closingBf = closing.stat.bloomFilter(
      xxhash64(col("v"), col("w")), nEdges, 0.01)
    val wedges = o1.join(o2, Seq("u")).filter(col("rv") < col("rw"))
      .filter(graft.functions.BloomMightContainLong.bloomMightContainLong(
        xxhash64(col("v"), col("w")), closingBf))
    val tri = wedges.join(closing, Seq("v", "w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
