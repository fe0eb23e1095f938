#!/usr/bin/env python3
"""Round-18 margin audit (run BEFORE committing q280-q283 fixtures).

Measures, at every scale factor, the float decision margins the new
queries depend on:
  - centroid-assignment gaps (best vs second-best L2) for every (rows,
    centroid-set) pair the fixtures use;
  - cosine rank gaps (adjacent top-k gaps) for the recall query's exact
    and probed rankings;
  - the recall totals old-vs-rebuilt (must be strictly higher for the
    rebuilt store at every SF).
Anything >= ~1e-6 is safe against the ~1e-12 summation-order error.
"""
import duckdb, sys

SFS = ["sf0.001", "sf0.01", "sf0.1"]

ASSIGN_GAP = """
WITH D AS (
  SELECT p.vec_id, c.cent_id,
         SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
  FROM ({pop}) p, ({cent}) c, range(1, 65) i(i)
  GROUP BY 1, 2),
R AS (
  SELECT vec_id, l2,
         row_number() OVER (PARTITION BY vec_id ORDER BY l2, cent_id) AS rk
  FROM D)
SELECT min(b.l2 - a.l2) FROM R a JOIN R b ON b.vec_id = a.vec_id
WHERE a.rk = 1 AND b.rk = 2
"""

def run(con, sql):
    return con.execute(sql).fetchone()[0]

for sf in SFS:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'/root/testdata/{sf}/embeddings.parquet'")
    evens = "SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id % 2 = 0"
    odds_dbl = ("SELECT vec_id, [x + x for x in embedding] AS v "
                "FROM embeddings WHERE vec_id % 2 = 1")
    odds_abs = ("SELECT vec_id, [abs(x) for x in embedding] AS v "
                "FROM embeddings WHERE vec_id % 2 = 1")
    queries = "SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id % 50 = 0"
    cent_even = (f"SELECT vec_id AS cent_id, v AS cent_vec FROM ({evens}) "
                 "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8")
    # q281: live corpus under the rebuilt SQ8 grid (takedown subtracted)
    l281 = (f"{evens} UNION ALL SELECT * FROM ({odds_dbl}) WHERE vec_id % 10 <> 5")
    cent281 = (f"SELECT vec_id AS cent_id, v AS cent_vec FROM ({l281}) "
               "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8")
    # q283: live corpus for the flat rebuild recall query (no takedown)
    l283 = f"{evens} UNION ALL {odds_abs}"
    cent283 = (f"SELECT vec_id AS cent_id, v AS cent_vec FROM ({l283}) "
               "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8")

    print(f"== {sf}")
    for name, pop, cent in [
        ("q281 doubled-odds under even centroids", odds_dbl, cent_even),
        ("q281 live corpus under its own centroids", l281, cent281),
        ("q281 queries under rebuilt centroids", queries, cent281),
        ("q283 abs-odds corpus under its own centroids", l283, cent283),
        ("q283 queries under rebuilt centroids", queries, cent283),
    ]:
        g = run(con, ASSIGN_GAP.format(pop=f"({pop})", cent=f"({cent})"))
        print(f"  assign gap  {name}: {g:.3e}")

    # q283 cosine rank gaps: exact brute force + both probed rankings
    def rank_gap(cand_join, label):
        sql = f"""
        WITH L AS ({l283}),
        CAND AS (
          SELECT q.vec_id AS query_id, l.vec_id AS neighbor_id,
                 SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE)) AS dot,
                 SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)) AS nq,
                 SUM(CAST(l.v[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE)) AS nc
          FROM embeddings q {cand_join}
          CROSS JOIN range(1, 65) i(i)
          WHERE q.vec_id % 50 = 0
          GROUP BY 1, 2),
        R AS (
          SELECT query_id, dot / sqrt(nq * nc) AS cos,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dot / sqrt(nq * nc) DESC, neighbor_id) AS rk
          FROM CAND)
        SELECT min(a.cos - b.cos) FROM R a JOIN R b
          ON b.query_id = a.query_id AND b.rk = a.rk + 1
        WHERE a.rk <= 4 AND a.cos <> b.cos
        """
        g = run(con, sql)
        print(f"  rank gap    {label}: {g:.3e}")
        # ties among adjacent top-4: engine-identical only if cos exact-equal
        ties = run(con, sql.replace("SELECT min(a.cos - b.cos)",
                                    "SELECT count(*)")
                          .replace("AND a.cos <> b.cos",
                                   "AND a.cos = b.cos"))
        print(f"  exact ties  {label}: {ties}")

    rank_gap("JOIN L l ON l.vec_id <> q.vec_id", "q283 exact brute force")
    rank_gap(f"""
      JOIN (SELECT d.vec_id, d.cent_id AS cell,
                   row_number() OVER (PARTITION BY d.vec_id
                     ORDER BY d.l2, d.cent_id) AS rk
            FROM (SELECT p.vec_id, c.cent_id,
                         SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
                  FROM ({queries}) p, ({cent_even}) c, range(1,65) i(i)
                  GROUP BY 1, 2) d QUALIFY rk = 1) cq ON cq.vec_id = q.vec_id
      JOIN (SELECT d.vec_id, d.cent_id AS cell,
                   row_number() OVER (PARTITION BY d.vec_id
                     ORDER BY d.l2, d.cent_id) AS rk
            FROM (SELECT p.vec_id, c.cent_id,
                         SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
                  FROM ({l283}) p, ({cent_even}) c, range(1,65) i(i)
                  GROUP BY 1, 2) d QUALIFY rk = 1) cl
        ON cl.cell = cq.cell
      JOIN L l ON l.vec_id = cl.vec_id AND l.vec_id <> q.vec_id
    """, "q283 old-grid probe")
    rank_gap(f"""
      JOIN (SELECT d.vec_id, d.cent_id AS cell,
                   row_number() OVER (PARTITION BY d.vec_id
                     ORDER BY d.l2, d.cent_id) AS rk
            FROM (SELECT p.vec_id, c.cent_id,
                         SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
                  FROM ({queries}) p, ({cent283}) c, range(1,65) i(i)
                  GROUP BY 1, 2) d QUALIFY rk = 1) cq ON cq.vec_id = q.vec_id
      JOIN (SELECT d.vec_id, d.cent_id AS cell,
                   row_number() OVER (PARTITION BY d.vec_id
                     ORDER BY d.l2, d.cent_id) AS rk
            FROM (SELECT p.vec_id, c.cent_id,
                         SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
                  FROM ({l283}) p, ({cent283}) c, range(1,65) i(i)
                  GROUP BY 1, 2) d QUALIFY rk = 1) cl
        ON cl.cell = cq.cell
      JOIN L l ON l.vec_id = cl.vec_id AND l.vec_id <> q.vec_id
    """, "q283 rebuilt-grid probe")

    # q283 recall totals: hits of each probe against exact top-3
    recall_sql = f"""
    WITH L AS ({l283}),
    EXC AS (
      SELECT q.vec_id AS query_id, l.vec_id AS neighbor_id,
             SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE)) /
             sqrt(SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)) *
                  SUM(CAST(l.v[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE))) AS cos
      FROM embeddings q JOIN L l ON l.vec_id <> q.vec_id
      CROSS JOIN range(1, 65) i(i)
      WHERE q.vec_id % 50 = 0 GROUP BY 1, 2),
    EXACT AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM EXC) WHERE rk <= 3),
    CO AS (SELECT p.vec_id, c.cent_id,
                  SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
           FROM ({l283}) p, ({cent_even}) c, range(1,65) i(i) GROUP BY 1,2),
    CN AS (SELECT p.vec_id, c.cent_id,
                  SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
           FROM ({l283}) p, ({cent283}) c, range(1,65) i(i) GROUP BY 1,2),
    LCO AS (SELECT vec_id, cent_id AS cell FROM CO
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY l2, cent_id) = 1),
    LCN AS (SELECT vec_id, cent_id AS cell FROM CN
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY l2, cent_id) = 1),
    QCO AS (SELECT d.vec_id, d.cent_id AS cell FROM
             (SELECT p.vec_id, c.cent_id,
                     SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
              FROM ({queries}) p, ({cent_even}) c, range(1,65) i(i) GROUP BY 1,2) d
            QUALIFY row_number() OVER (PARTITION BY d.vec_id ORDER BY d.l2, d.cent_id) = 1),
    QCN AS (SELECT d.vec_id, d.cent_id AS cell FROM
             (SELECT p.vec_id, c.cent_id,
                     SUM(POW(CAST(p.v[i.i] AS DOUBLE) - CAST(c.cent_vec[i.i] AS DOUBLE), 2)) AS l2
              FROM ({queries}) p, ({cent283}) c, range(1,65) i(i) GROUP BY 1,2) d
            QUALIFY row_number() OVER (PARTITION BY d.vec_id ORDER BY d.l2, d.cent_id) = 1),
    APO AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, l.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE)) /
                 sqrt(SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)) *
                      SUM(CAST(l.v[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE))) DESC,
                 l.vec_id) AS rk
        FROM embeddings q
        JOIN QCO cq ON cq.vec_id = q.vec_id
        JOIN LCO cl ON cl.cell = cq.cell
        JOIN L l ON l.vec_id = cl.vec_id AND l.vec_id <> q.vec_id
        CROSS JOIN range(1,65) i(i)
        WHERE q.vec_id % 50 = 0 GROUP BY q.vec_id, l.vec_id) WHERE rk <= 3),
    APN AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, l.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE)) /
                 sqrt(SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)) *
                      SUM(CAST(l.v[i.i] AS DOUBLE) * CAST(l.v[i.i] AS DOUBLE))) DESC,
                 l.vec_id) AS rk
        FROM embeddings q
        JOIN QCN cq ON cq.vec_id = q.vec_id
        JOIN LCN cl ON cl.cell = cq.cell
        JOIN L l ON l.vec_id = cl.vec_id AND l.vec_id <> q.vec_id
        CROSS JOIN range(1,65) i(i)
        WHERE q.vec_id % 50 = 0 GROUP BY q.vec_id, l.vec_id) WHERE rk <= 3)
    SELECT
      (SELECT count(*) FROM EXACT e JOIN APO a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id) AS hits_old,
      (SELECT count(*) FROM EXACT e JOIN APN a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id) AS hits_new,
      (SELECT count(*) FROM EXACT) AS n_exact
    """
    hits_old, hits_new, n_exact = con.execute(recall_sql).fetchone()
    verdict = "OK strictly higher" if hits_new > hits_old else "!! NOT higher"
    print(f"  recall      q283 old={hits_old} new={hits_new} exact={n_exact}  {verdict}")
    con.close()
print("done")
