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
  * members, diameter a handful), so this beats the O(log n)
  * large-star/small-star alternating scheme in practice — that variant
  * is the escape hatch if a pathological corpus ever chains thousands
  * of docs. Each round's label table is `localCheckpoint`ed: the
  * iteration would otherwise grow an exponentially-deep lineage that
  * re-executes every prior round on each action (on a real cluster a
  * reliable `checkpoint` to the DFS replaces this; local checkpoints
  * die with executors).
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
    * @return (`idCol`, cluster_id) — cluster_id is the min doc id of
    *         the component, so output ids are stable under re-runs and
    *         under edge-list reordering.
    * @throws IllegalStateException if `maxIter` rounds pass without
    *         reaching the fixpoint (never silently wrong clusters).
    */
  def connectedComponents(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String = "id_a", dstCol: String = "id_b",
      maxIter: Int = 30): DataFrame = {
    require(maxIter >= 1, "maxIter must be at least 1")
    // symmetrize once and materialize: every round joins this frame
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol).cast("long").as("id"))
      .withColumn("label", col("id"))
      .localCheckpoint()
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
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(labels("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = next.filter(col("label") < col("old_label")).count()
      labels = next.drop("old_label")
      converged = changed == 0L
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter or switch to the large-star/small-star scheme")
    labels.select(col("id").as(idCol), col("label").as("cluster_id"))
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
