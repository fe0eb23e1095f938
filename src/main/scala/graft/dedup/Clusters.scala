package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster construction: connected components over a verified
  * near-dup pair list, turning pairwise evidence into per-document
  * cluster ids so a keeper policy can act on WHOLE duplicate groups.
  *
  * Pairwise drop-the-larger-id (the pipeline's first-pass policy) is
  * order-sensitive on transitive chains: for A~B, B~C (A<B<C) it drops
  * both B and C even when A~C was never verified, and it cannot express
  * "keep the best-quality member". Components fix both: every doc gets
  * the minimal reachable doc id as `cluster_id`, and the keeper choice
  * becomes a per-cluster aggregation.
  *
  * Scale design (100 TB): min-label propagation — per round, every
  * node's label becomes the min of its own and its neighbours' labels.
  * Each round is one equi-join of the (symmetrized) edge list against
  * the label table plus a groupBy on the destination id: shuffle keys
  * are single longs, work is O(|E|) per round, and rounds = cluster
  * DIAMETER, not corpus size. Near-dup clusters are shallow (dozens of
  * members, diameter a handful), so plain propagation wins in practice;
  * a pathological corpus that CHAINS thousands of docs (boilerplate-
  * linked pages are the classic) escalates automatically: past
  * `shortcutAfter` rounds each round also shortcuts label := label of
  * label (pointer doubling, the classic PRAM / hash-to-min trick), so
  * remaining distance to the component min halves per round and even a
  * million-hop chain converges in O(log diameter) extra rounds. The
  * shortcut is one extra self-join of the label table per round, which
  * is why it is not on from round one — ordinary shallow clusters
  * never pay for it.
  *
  * Each round's label table has its lineage truncated: the iteration
  * would otherwise grow an exponentially-deep plan that re-executes
  * every prior round on each action. By default that is
  * `localCheckpoint` (fast, but its blocks die with executors — an
  * executor loss mid-iteration fails the job); pass `checkpointDir` to
  * use reliable `checkpoint` into that directory instead, which
  * survives executor loss and is the production setting on a real
  * cluster.
  *
  * Convergence is detected with an exact per-round changed-row count
  * (each round keeps the previous label alongside the new one, and the
  * round is final when no row strictly decreased) — a single scalar
  * action per round, robust to empty inputs and immune to the
  * aggregate-overflow aliasing a sum-of-labels delta would risk at
  * full corpus scale.
  */
object Clusters {

  /** Connected components of `nodes` under undirected `edges`.
    *
    * @param nodes  one row per node; `idCol` must be a long id.
    * @param edges  verified pair list; `srcCol`/`dstCol` reference
    *               `idCol` values. Extra columns are ignored. Nodes
    *               absent from `edges` come out as singletons.
    * @param checkpointDir reliable-checkpoint directory for per-round
    *               lineage truncation (survives executor loss; the
    *               production setting). Default None = `localCheckpoint`
    *               (faster, test/single-JVM setting).
    * @param shortcutAfter rounds of plain propagation before each round
    *               additionally pointer-doubles (label := label of
    *               label), making pathological long chains converge in
    *               O(log diameter) rounds instead of hitting `maxIter`.
    * @return (`idCol`, cluster_id) — cluster_id is the min doc id of
    *         the component, so output ids are stable under re-runs and
    *         under edge-list reordering.
    * @throws IllegalStateException if `maxIter` rounds pass without
    *         reaching the fixpoint (never silently wrong clusters).
    */
  def connectedComponents(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b",
      maxIter: Int = 30,
      checkpointDir: Option[String] = None,
      shortcutAfter: Int = 5): DataFrame = {
    require(maxIter >= 1, "maxIter must be at least 1")
    require(shortcutAfter >= 0, "shortcutAfter must be non-negative")
    // setCheckpointDir is application-global state; remember and restore
    // the caller's setting so this operator does not silently repoint
    // every later .checkpoint() in the app at our directory. (If no dir
    // was set before, ours necessarily remains — Spark has no unset.)
    // CONCURRENCY CONTRACT: because the checkpoint dir is global to the
    // SparkContext, passing `checkpointDir` here is only safe when no
    // OTHER job on the same context calls .checkpoint() concurrently
    // (including a second connectedComponents with a different dir) —
    // the two would race on the global and checkpoint into each other's
    // directories. Concurrent callers should instead configure
    // sc.setCheckpointDir ONCE at application startup and pass
    // checkpointDir = Some(sc.getCheckpointDir.get), which this code
    // then sets to the identical value (a no-op race).
    val sc = nodes.sparkSession.sparkContext
    val prevCheckpointDir = sc.getCheckpointDir
    val truncate: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        sc.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }
    try {
    // symmetrize once and materialize: every round joins this frame
    val sym = truncate(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))))
    var labels = truncate(
      nodes.select(col(idCol).cast("long").as("id"))
        .withColumn("label", col("id")))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(sym("dst").as("nid"))
        .agg(min(col("label")).as("nbr_label"))
      // keep the previous label through the checkpoint so convergence is
      // an exact changed-row COUNT — a sum(label) delta would NPE on an
      // empty node set and can alias to zero under 64-bit wrap at the
      // corpus sizes this targets
      val propagated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(labels("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer doubling past the escalation threshold: label(x) :=
      // label(label(x)). A label is always the id of a component member
      // and label(m) <= m, so the shortcut stays component-internal and
      // monotonically non-increasing — the fixpoint argument and the
      // changed-count convergence test are unchanged, only reached
      // exponentially faster on long chains.
      val next =
        if (round < shortcutAfter) truncate(propagated)
        else {
          // materialize BEFORE the self-join: two consumers of the lazy
          // propagation frame would execute its join+agg subtree twice
          val prop = truncate(propagated)
          val parent = prop.select(col("id").as("pid"), col("label").as("plabel"))
          // post-projection names are unique, so plain col() refs avoid
          // the self-join attribute ambiguity prop("...") would invite
          truncate(
            prop.join(parent, col("label") === col("pid"), "left")
              .select(col("id"), col("old_label"),
                least(col("label"), coalesce(col("plabel"), col("label"))).as("label")))
        }
      val changed = next.filter(col("label") < col("old_label")).count()
      labels = next.drop("old_label")
      converged = changed == 0L
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter (or lower shortcutAfter; pointer doubling converges " +
        "in O(log diameter) rounds once active)")
    labels.select(col("id").as(idCol), col("label").as("cluster_id"))
    } finally {
      if (checkpointDir.isDefined) prevCheckpointDir.foreach(sc.setCheckpointDir)
    }
  }

  /** One keeper per duplicate cluster, chosen by HIGHEST score (then
    * min id as the deterministic tie-break) — the quality-aware dedup
    * policy pairwise min-id cannot express. `scores` carries one row
    * per doc (`idCol`, `scoreCol`); the keeper of every cluster —
    * singletons included — survives, so the result IS the deduped
    * corpus id set. The rank window partitions by cluster_id
    * (bounded groups), never the whole corpus. */
  def keepersByScore(
      clusters: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol))
    clusters.join(scores, idCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cluster_id"), col(scoreCol))
  }
}
