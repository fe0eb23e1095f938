package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics through the oracle gate. The dedup family
  * already runs one graph algorithm (q110's connected components);
  * this family adds the importance-propagation side — the link-graph
  * prior a crawl-curation pipeline computes before quality filtering.
  */
object GraphQueries {

  /** The oracle mirrors [[graft.operators.Graph.fixedPointPageRank]]
    * round by round as chained CTEs — every operation is integer
    * (BIGINT micro-unit ranks, `//` division, `* 85 // 100` damping),
    * so both engines produce bit-identical ranks regardless of
    * partitioning or merge order. DuckDB widens SUM(BIGINT) to
    * HUGEINT; the final CAST narrows it back — values stay far below
    * either bound. */
  private val pagerankOracle: String = {
    def round(prev: String, cur: String): String = s"""
        $cur AS (SELECT e.dst AS node,
                        150000 + (SUM(r.pr // d.deg) * 85) // 100 AS pr
                 FROM E e JOIN $prev r ON r.node = e.src
                          JOIN D d ON d.src = e.src
                 GROUP BY e.dst)"""
    s"""
        WITH E0 AS (SELECT DISTINCT l_partkey * 2 AS src,
                           l_suppkey * 2 + 1 AS dst
                    FROM lineitem),
        E AS (SELECT src, dst FROM E0
              UNION ALL SELECT dst AS src, src AS dst FROM E0),
        D AS (SELECT src, count(*) AS deg FROM E GROUP BY src),
        R0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM D),
        ${round("R0", "R1")},
        ${round("R1", "R2")},
        ${round("R2", "R3")}
        SELECT node, CAST(pr AS BIGINT) AS pr FROM R3
        ORDER BY pr DESC, node LIMIT 50"""
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q139_pagerank",
      "Fixed-point integer PageRank (operators.Graph): three damped " +
        "rounds over the symmetrized part<->supplier co-occurrence " +
        "graph (distinct lineitem pairs; node ids disjoint by " +
        "even/odd encoding). Ranks are BIGINT micro-units and every " +
        "step is integer division — exact and associative, so the " +
        "result is bit-identical under any partitioning and the " +
        "oracle can unroll the identical rounds as CTEs (float " +
        "PageRank would make the hash a summation-order lottery). " +
        "Each round is ONE shuffle: edges join ranks on src (the " +
        "persisted edge+degree frame keeps its partitioning across " +
        "rounds), then a partial-agg groupBy(dst) with map-side " +
        "combine; AQE splits hub-skewed reducers. Output is the " +
        "top-50 nodes — the importance ranking itself.",
      (spark, dir) => {
        val e0 = Tables.table(spark, dir, "lineitem")
          .select((col("l_partkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.Graph.fixedPointPageRank(edges, iters = 3)
          .orderBy(col("pr").desc, col("node"))
          .limit(50)
      },
      Some(pagerankOracle)),

    GraftQuery(
      "q143_triangle_counts",
      "Per-node triangle counting over the part co-purchase graph " +
        "(parts sharing an order; per-order fan-out is bounded by " +
        "order size, so edge construction never explodes) — the " +
        "clustering/cohesion signal of the graph family. The " +
        "implementation orients each edge from its lower-(degree,id) " +
        "endpoint (Suri-Vassilvitskii), so every triangle is " +
        "enumerated exactly once and wedge fan-out rides the ORIENTED " +
        "out-degree, O(sqrt(m)) — a hub's raw degree never squares " +
        "into the join. Counts are exact integers; the oracle " +
        "re-derives them with the naive a<b<c three-way self-join, " +
        "and both enumerations must agree node for node.",
      (spark, dir) => {
        val lp = Tables.table(spark, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val l2 = lp.select(col("o"), col("p").as("p2"))
        // no distinct here: triangleCounts canonicalizes+dedupes its
        // input anyway — a query-side distinct would just add a
        // full-width shuffle of the raw pair stream
        val edges = lp.join(l2, Seq("o"))
          .filter(col("p") < col("p2"))
          .select(col("p").as("src"), col("p2").as("dst"))
        graft.operators.Graph.triangleCounts(edges)
          .orderBy(col("node"))
      },
      Some("""
        WITH LP AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        E AS (SELECT DISTINCT a.p AS a, b.p AS b
              FROM LP a JOIN LP b ON a.o = b.o AND a.p < b.p),
        T AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM E e1 JOIN E e2 ON e2.a = e1.b
              JOIN E e3 ON e3.a = e1.a AND e3.b = e2.b),
        N AS (SELECT x AS node FROM T
              UNION ALL SELECT y FROM T
              UNION ALL SELECT z FROM T)
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM N GROUP BY node ORDER BY node"""))
  )
}
