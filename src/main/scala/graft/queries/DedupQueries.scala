package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Clusters, Dedup}

/** Near-dedup operator verification: MinHash signatures, LSH candidate
  * pairs, n-gram Jaccard ground truth, SimHash. All constructions are
  * engine-agnostic (md5 hex, lexicographic minima, integer-arithmetic
  * thresholds) so the DuckDB oracles are exact, not approximate.
  */
object DedupQueries {

  /** Shared DuckDB CTE: distinct word-trigram shingles per doc. */
  private val shingleCte: String = raw"""
    WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
    S AS (SELECT DISTINCT doc_id,
                 unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
          FROM W)"""

  /** Shared DuckDB CTE chain (appended after the RECURSIVE shingle
    * CTE): LSH-verified pairs -> symmetric edges -> min-label reachability
    * — the single definition q72 and q73 both build on, so the banding
    * scheme and 1:2 threshold can never drift between their oracles.
    * Split as [[edgeCte]] (through the verified pair set E) plus the
    * reachability tail, so q171 can reuse the SAME edge definition
    * under a different (multi-signal) edge union. */
  private val edgeCte: String = raw"""
        H AS (SELECT doc_id, md5(g) AS hg FROM S),
        SIG AS (
          SELECT doc_id,
                 min(substr(hg, 1, 4)) AS h0, min(substr(hg, 5, 4)) AS h1,
                 min(substr(hg, 9, 4)) AS h2, min(substr(hg, 13, 4)) AS h3,
                 min(substr(hg, 17, 4)) AS h4, min(substr(hg, 21, 4)) AS h5,
                 min(substr(hg, 25, 4)) AS h6, min(substr(hg, 29, 4)) AS h7
          FROM H GROUP BY doc_id),
        B AS (
          SELECT doc_id, t.b AS band,
                 CASE t.b WHEN 0 THEN md5(h0 || h1) WHEN 1 THEN md5(h2 || h3)
                          WHEN 2 THEN md5(h4 || h5) ELSE md5(h6 || h7) END AS bv
          FROM SIG, unnest([0, 1, 2, 3]) AS t(b)),
        C AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM B x JOIN B y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
        N AS (SELECT doc_id, count(*) AS n FROM S GROUP BY doc_id),
        P AS (SELECT c.id_a, c.id_b, count(*) AS common
              FROM C c
              JOIN S x ON x.doc_id = c.id_a
              JOIN S y ON y.doc_id = c.id_b AND y.g = x.g
              GROUP BY 1, 2),
        E AS (SELECT P.id_a, P.id_b
              FROM P JOIN N na ON P.id_a = na.doc_id JOIN N nb ON P.id_b = nb.doc_id
              WHERE common * 2 >= (na.n + nb.n - common) * 1)"""

  private val clusterCte: String = edgeCte + raw""",
        SYM AS (SELECT id_a AS src, id_b AS dst FROM E
                UNION ALL SELECT id_b AS src, id_a AS dst FROM E),
        REACH AS (
          SELECT doc_id AS id, doc_id AS r FROM documents
          UNION
          SELECT sy.dst AS id, REACH.r AS r
          FROM SYM sy JOIN REACH ON REACH.id = sy.src)"""


  /** q93's two-set incremental near-dedup oracle with the INDEX side
    * of the cross-batch candidate join restrictable: q93 passes no
    * filter, the delete-lifecycle pair (q263/q264) passes the
    * tombstone exclusion — one definition, so the banding scheme and
    * the 1:2 threshold can never drift between the three. */
  private def incNearDedupOracle(indexFilter: String): String =
    shingleCte + raw""",
        H AS (SELECT doc_id, md5(g) AS hg FROM S),
        SIG AS (
          SELECT doc_id,
                 min(substr(hg, 1, 4)) AS h0, min(substr(hg, 5, 4)) AS h1,
                 min(substr(hg, 9, 4)) AS h2, min(substr(hg, 13, 4)) AS h3,
                 min(substr(hg, 17, 4)) AS h4, min(substr(hg, 21, 4)) AS h5,
                 min(substr(hg, 25, 4)) AS h6, min(substr(hg, 29, 4)) AS h7
          FROM H GROUP BY doc_id),
        B AS (
          SELECT doc_id, t.b AS band,
                 CASE t.b WHEN 0 THEN md5(h0 || h1) WHEN 1 THEN md5(h2 || h3)
                          WHEN 2 THEN md5(h4 || h5) ELSE md5(h6 || h7) END AS bv
          FROM SIG, unnest([0, 1, 2, 3]) AS t(b)),
        N AS (SELECT doc_id, count(*) AS n FROM S GROUP BY doc_id),
        CW AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM B x JOIN B y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
          WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 1),
        PW AS (SELECT c.id_a, c.id_b, count(*) AS common
               FROM CW c
               JOIN S x ON x.doc_id = c.id_a
               JOIN S y ON y.doc_id = c.id_b AND y.g = x.g
               GROUP BY 1, 2),
        WD AS (SELECT DISTINCT p.id_b
               FROM PW p JOIN N na ON p.id_a = na.doc_id
               JOIN N nb ON p.id_b = nb.doc_id
               WHERE p.common * 2 >= (na.n + nb.n - p.common) * 1),
        SURV1 AS (SELECT doc_id FROM documents
                  WHERE doc_id % 2 = 1
                    AND doc_id NOT IN (SELECT id_b FROM WD)),
        CC AS (
          SELECT DISTINCT o.doc_id AS id_a, sv.doc_id AS id_b
          FROM B o JOIN B nn ON o.band = nn.band AND o.bv = nn.bv
          JOIN SURV1 sv ON sv.doc_id = nn.doc_id
          WHERE o.doc_id % 2 = 0$indexFilter),
        PC AS (SELECT c.id_a, c.id_b, count(*) AS common
               FROM CC c
               JOIN S x ON x.doc_id = c.id_a
               JOIN S y ON y.doc_id = c.id_b AND y.g = x.g
               GROUP BY 1, 2),
        CD AS (SELECT DISTINCT p.id_b
               FROM PC p JOIN N na ON p.id_a = na.doc_id
               JOIN N nb ON p.id_b = nb.doc_id
               WHERE p.common * 2 >= (na.n + nb.n - p.common) * 1)
        SELECT doc_id FROM SURV1
        WHERE doc_id NOT IN (SELECT id_b FROM CD)
        ORDER BY doc_id"""

  /** Shared by the exact-dedup delete pair (q261 masked / q262
    * purged): the batch is the odd half PLUS exact copies (new ids)
    * of the % 10 = 4 even docs; the % 20 = 4 evens' fingerprints are
    * tombstoned, so THEIR copies re-admit while the % 20 = 14 copies
    * still drop — the takedown-then-repost flow, non-vacuous at
    * every SF by construction (the testdata itself has no exact
    * cross-half duplicates below sf0.1). */
  private def exactDedupCopiesOracle(excludeDeleted: Boolean): String = {
    val liveIdx =
      if (excludeDeleted) "SELECT fp FROM IDX WHERE fp NOT IN (SELECT fp FROM DEL)"
      else "SELECT fp FROM IDX"
    raw"""
        WITH FP AS (SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
                    FROM documents),
        IDX AS (SELECT DISTINCT fp FROM FP WHERE doc_id % 2 = 0),
        DEL AS (SELECT DISTINCT fp FROM FP WHERE doc_id % 2 = 0 AND doc_id % 20 = 4),
        LIVEIDX AS ($liveIdx),
        NEW AS (SELECT doc_id, fp FROM FP WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id + 1000000, fp FROM FP
                WHERE doc_id % 2 = 0 AND doc_id % 10 = 4),
        SV AS (SELECT doc_id, fp FROM NEW n
               WHERE NOT EXISTS (SELECT 1 FROM LIVEIDX i WHERE i.fp = n.fp))
        SELECT doc_id FROM SV
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)
        ORDER BY doc_id"""
  }

  private val exactDeleteOracle: String = exactDedupCopiesOracle(excludeDeleted = true)

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q20_minhash_signature",
      "8-hash MinHash signature (disjoint md5 chunks) over word-trigram shingles.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.minhashSignature(d, "doc_id", "text", nHashes = 8)
          .orderBy(col("doc_id"))
      },
      Some(shingleCte + raw""",
        H AS (SELECT doc_id, md5(g) AS hg FROM S)
        SELECT doc_id,
               min(substr(hg, 1, 4)) AS h0, min(substr(hg, 5, 4)) AS h1,
               min(substr(hg, 9, 4)) AS h2, min(substr(hg, 13, 4)) AS h3,
               min(substr(hg, 17, 4)) AS h4, min(substr(hg, 21, 4)) AS h5,
               min(substr(hg, 25, 4)) AS h6, min(substr(hg, 29, 4)) AS h7
        FROM H GROUP BY doc_id ORDER BY doc_id""")),

    GraftQuery(
      "q21_lsh_candidates",
      "LSH banding (4 bands x 2 rows) over the MinHash signature; bucket join.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val sig = Dedup.minhashSignature(d, "doc_id", "text", nHashes = 8)
        Dedup.lshCandidates(sig, "doc_id", nHashes = 8, rowsPerBand = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(shingleCte + raw""",
        H AS (SELECT doc_id, md5(g) AS hg FROM S),
        SIG AS (
          SELECT doc_id,
                 min(substr(hg, 1, 4)) AS h0, min(substr(hg, 5, 4)) AS h1,
                 min(substr(hg, 9, 4)) AS h2, min(substr(hg, 13, 4)) AS h3,
                 min(substr(hg, 17, 4)) AS h4, min(substr(hg, 21, 4)) AS h5,
                 min(substr(hg, 25, 4)) AS h6, min(substr(hg, 29, 4)) AS h7
          FROM H GROUP BY doc_id),
        B AS (
          SELECT doc_id, t.b AS band,
                 CASE t.b WHEN 0 THEN md5(h0 || h1) WHEN 1 THEN md5(h2 || h3)
                          WHEN 2 THEN md5(h4 || h5) ELSE md5(h6 || h7) END AS bv
          FROM SIG, unnest([0, 1, 2, 3]) AS t(b))
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM B x JOIN B y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
        ORDER BY id_a, id_b""")),

    GraftQuery(
      "q22_jaccard_pairs",
      "n-gram Jaccard >= 1/2 via integer arithmetic (all-pairs ground truth).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.jaccardPairs(d, "doc_id", "text", p = 1, q = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(shingleCte + raw""",
        N AS (SELECT doc_id, count(*) AS n FROM S GROUP BY doc_id),
        P AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS common
              FROM S x JOIN S y ON x.g = y.g AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
        SELECT id_a, id_b, common, na.n + nb.n - common AS uni
        FROM P JOIN N na ON P.id_a = na.doc_id JOIN N nb ON P.id_b = nb.doc_id
        WHERE common * 2 >= (na.n + nb.n - common) * 1
        ORDER BY id_a, id_b""")),

    GraftQuery(
      "q43_lsh_verified_dups",
      "The scale near-dedup path: LSH candidates -> exact Jaccard verify on " +
        "candidates only (never all-pairs); oracle composes the q21+q22 CTEs.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.jaccardOnCandidates(d, "doc_id", "text", p = 1, q = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(shingleCte + raw""",
        H AS (SELECT doc_id, md5(g) AS hg FROM S),
        SIG AS (
          SELECT doc_id,
                 min(substr(hg, 1, 4)) AS h0, min(substr(hg, 5, 4)) AS h1,
                 min(substr(hg, 9, 4)) AS h2, min(substr(hg, 13, 4)) AS h3,
                 min(substr(hg, 17, 4)) AS h4, min(substr(hg, 21, 4)) AS h5,
                 min(substr(hg, 25, 4)) AS h6, min(substr(hg, 29, 4)) AS h7
          FROM H GROUP BY doc_id),
        B AS (
          SELECT doc_id, t.b AS band,
                 CASE t.b WHEN 0 THEN md5(h0 || h1) WHEN 1 THEN md5(h2 || h3)
                          WHEN 2 THEN md5(h4 || h5) ELSE md5(h6 || h7) END AS bv
          FROM SIG, unnest([0, 1, 2, 3]) AS t(b)),
        C AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM B x JOIN B y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
        N AS (SELECT doc_id, count(*) AS n FROM S GROUP BY doc_id),
        P AS (SELECT c.id_a, c.id_b, count(*) AS common
              FROM C c
              JOIN S x ON x.doc_id = c.id_a
              JOIN S y ON y.doc_id = c.id_b AND y.g = x.g
              GROUP BY 1, 2)
        SELECT id_a, id_b, common, na.n + nb.n - common AS uni
        FROM P JOIN N na ON P.id_a = na.doc_id JOIN N nb ON P.id_b = nb.doc_id
        WHERE common * 2 >= (na.n + nb.n - common) * 1
        ORDER BY id_a, id_b""")),

    GraftQuery(
      "q23_simhash",
      "32-bit SimHash from md5-nibble sign sums (integer arithmetic end-to-end).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.simhash32(d, "doc_id", "text").orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS wd FROM documents),
        H AS (SELECT doc_id, md5(wd) AS h FROM W),
        B AS (
          SELECT doc_id, t.k AS k,
                 SUM(CASE WHEN substr(h, CAST(t.k AS INTEGER), 1)
                          IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
          FROM H, unnest(range(1, 33)) AS t(k)
          GROUP BY doc_id, t.k)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, k - 1) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM B GROUP BY doc_id ORDER BY doc_id""")),

    GraftQuery(
      "q49_incremental_dedup",
      "Incremental exact dedup: a new batch (odd ids) deduped against the " +
        "accumulated corpus index (even ids) — anti-join on the 16-byte " +
        "fingerprint, then min-id within the batch. The production flow: " +
        "never re-dedup the corpus.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val index = Dedup.exactGroups(d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
          .select(col("fp"))
        Dedup.dedupAgainstIndex(
            d.filter(col("doc_id") % 2 === 1), index, "doc_id", "text")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH IDX AS (
          SELECT DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE doc_id % 2 = 0),
        NEW AS (
          SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE doc_id % 2 = 1),
        S AS (SELECT doc_id, fp FROM NEW n
              WHERE NOT EXISTS (SELECT 1 FROM IDX i WHERE i.fp = n.fp))
        SELECT doc_id FROM S
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)
        ORDER BY doc_id""")),

    GraftQuery(
      "q93_incremental_near_dedup",
      "Incremental NEAR-dedup: a new batch (odd ids) against a durable " +
        "LSH band index seeded from the accumulated corpus (even ids) — " +
        "q49's production flow for NEAR duplicates, and the exact batch " +
        "core the streaming NearDedupStream runs per micro-batch " +
        "(within-batch candidates->verify, then band-join + verify " +
        "against the index, old texts semi-join-pruned). Also exercises " +
        "the root-file index seed path end-to-end. Oracle composes " +
        "q43's CTEs into the two-set version; integer 1:2 threshold, " +
        "hash-exact.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val old = d.filter(col("doc_id") % 2 === 0)
        val fresh = d.filter(col("doc_id") % 2 === 1)
        // fixed scratch path: repeated verify/bench runs overwrite one
        // seed instead of accumulating temp dirs
        val idx = QueryScratch.dir("graft_q93_index")
        graft.streaming.NearDedupStream
          .backfillIndex(old, "doc_id", "text", idx)
        graft.streaming.NearDedupStream
          .nearDedupBatch(fresh, idx, "doc_id", "text")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(incNearDedupOracle(""))),

    GraftQuery(
      "q261_dedup_store_deletes",
      "Fingerprint-store DELETE path — the takedown half of the " +
        "exact-dedup history's lifecycle (the dedup face of " +
        "q249/q256): the even half's fingerprints seed the durable " +
        "index, the % 20 = 4 evens' fingerprints are tombstoned as a " +
        "delete batch, and the next batch (odd half PLUS exact " +
        "copies, under fresh ids, of every % 10 = 4 even doc) dedups " +
        "against the MASKED index — copies of deleted docs RE-ADMIT " +
        "(the store no longer remembers them: takedown-then-repost), " +
        "copies of the % 20 = 14 docs still drop. Masking is batch-" +
        "ordered (a fingerprint re-written after its delete would " +
        "count as history again), shared Tombstones layout, stamped " +
        "and fence-composable.",
      (spark, dir) => {
        import graft.streaming.IncrementalDedup
        val d = Tables.table(spark, dir, "documents")
        val evens = d.filter(col("doc_id") % 2 === 0)
        val idx = QueryScratch.dir("graft_q261_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        Dedup.exactGroups(evens, "doc_id", "text").select(col("fp"))
          .write.mode("overwrite").parquet(idx)
        IncrementalDedup.deleteBatch(spark, idx,
          Dedup.exactGroups(evens.filter(col("doc_id") % 20 === 4),
            "doc_id", "text").select(col("fp")),
          "fp", batchId = 0L)
        val copies = evens.filter(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text")).unionByName(copies)
        IncrementalDedup.dedupBatch(batch, idx, "doc_id", "text")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(exactDeleteOracle)),

    GraftQuery(
      "q262_dedup_store_purge",
      "The PHYSICAL half of q261's delete path: same store, same " +
        "% 20 = 4 tombstone batch — but purged (BatchIndex.rewriteAll " +
        "folds every partition into fresh seed files minus the " +
        "tombstoned fingerprints under compaction's crash-safe " +
        "staging+journal protocol, then the tombstone store drops), " +
        "then the batch dedups with NO mask. Survivors must equal " +
        "q261's masked run exactly (oracle shared verbatim) while " +
        "the deleted fingerprints' bytes are no longer on disk.",
      (spark, dir) => {
        import graft.streaming.IncrementalDedup
        val d = Tables.table(spark, dir, "documents")
        val evens = d.filter(col("doc_id") % 2 === 0)
        val idx = QueryScratch.dir("graft_q262_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        Dedup.exactGroups(evens, "doc_id", "text").select(col("fp"))
          .write.mode("overwrite").parquet(idx)
        IncrementalDedup.deleteBatch(spark, idx,
          Dedup.exactGroups(evens.filter(col("doc_id") % 20 === 4),
            "doc_id", "text").select(col("fp")),
          "fp", batchId = 0L)
        IncrementalDedup.purgeTombstones(spark, idx)
        val copies = evens.filter(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text")).unionByName(copies)
        IncrementalDedup.dedupBatch(batch, idx, "doc_id", "text")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(exactDeleteOracle)),

    GraftQuery(
      "q263_neardedup_store_deletes",
      "Near-dedup index DELETE path — q261's takedown contract for " +
        "the LSH band/doc store pair: q93's build (even half " +
        "backfilled), then the % 8 = 0 even ids tombstoned (ONE " +
        "tombstone set at the index root covers both stores), then " +
        "the odd half dedups against the MASKED index — a deleted " +
        "doc's bands stop generating candidates and its text stops " +
        "being fetched for verification, so its near-duplicates " +
        "RE-ADMIT. The oracle is q93's SQL with the tombstoned ids " +
        "excluded from the cross-batch candidate join, banding and " +
        "threshold text shared verbatim.",
      (spark, dir) => {
        import graft.streaming.NearDedupStream
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q263_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        NearDedupStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        NearDedupStream.deleteBatch(spark, idx,
          d.filter(col("doc_id") % 2 === 0 && col("doc_id") % 8 === 0)
            .select(col("doc_id")),
          "doc_id", batchId = 0L)
        NearDedupStream.nearDedupBatch(
            d.filter(col("doc_id") % 2 === 1), idx, "doc_id", "text")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(incNearDedupOracle(" AND o.doc_id % 8 <> 0"))),

    GraftQuery(
      "q269_neardedup_asof_before_delete",
      "q263's delete under the AS-OF fence: same build, same % 8 = 0 " +
        "tombstone batch at delete batch 0 — but the odd half dedups " +
        "PINNED BEFORE the delete (beforeBatch = 0), so the " +
        "tombstones on disk are invisible, the masked reads serve " +
        "the full history, and the survivors equal q93's verbatim " +
        "(oracle shared). The fence contract composes across the " +
        "whole lifecycle: what batch 0 saw is reproducible AFTER a " +
        "takedown lands, until a purge destroys fenced history.",
      (spark, dir) => {
        import graft.streaming.NearDedupStream
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q269_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        NearDedupStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        NearDedupStream.deleteBatch(spark, idx,
          d.filter(col("doc_id") % 2 === 0 && col("doc_id") % 8 === 0)
            .select(col("doc_id")),
          "doc_id", batchId = 0L)
        NearDedupStream.nearDedupBatch(
            d.filter(col("doc_id") % 2 === 1), idx, "doc_id", "text",
            beforeBatch = 0L)
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(incNearDedupOracle(""))),

    GraftQuery(
      "q270_dedup_asof_before_delete",
      "q261's delete under the AS-OF fence: same seed, same % 20 = 4 " +
        "fingerprint tombstone batch at delete batch 0 — but the " +
        "batch (odd half + copies of the % 10 = 4 evens) dedups " +
        "PINNED BEFORE the delete (beforeBatch = 0): every copy " +
        "drops, exactly as if the takedown never happened, while the " +
        "live read (q261) re-admits the deleted docs' copies. Oracle " +
        "is q261's SQL with the deletion exclusion removed — one " +
        "definition, two fences.",
      (spark, dir) => {
        import graft.streaming.IncrementalDedup
        val d = Tables.table(spark, dir, "documents")
        val evens = d.filter(col("doc_id") % 2 === 0)
        val idx = QueryScratch.dir("graft_q270_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        Dedup.exactGroups(evens, "doc_id", "text").select(col("fp"))
          .write.mode("overwrite").parquet(idx)
        IncrementalDedup.deleteBatch(spark, idx,
          Dedup.exactGroups(evens.filter(col("doc_id") % 20 === 4),
            "doc_id", "text").select(col("fp")),
          "fp", batchId = 0L)
        val copies = evens.filter(col("doc_id") % 10 === 4)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val batch = d.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text")).unionByName(copies)
        IncrementalDedup.dedupBatch(batch, idx, "doc_id", "text",
            beforeBatch = 0L)
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(exactDedupCopiesOracle(excludeDeleted = false))),

    GraftQuery(
      "q264_neardedup_store_purge",
      "The PHYSICAL half of q263: same tombstone batch, but purged — " +
        "docs rewrite FIRST (the text is the sensitive payload), then " +
        "bands, each under the crash-safe staging+journal protocol, " +
        "tombstones dropped last — and the odd half dedups with NO " +
        "mask. Survivors equal q263's masked run exactly (oracle " +
        "shared verbatim) while the deleted docs' text and band " +
        "bytes are no longer on disk.",
      (spark, dir) => {
        import graft.streaming.NearDedupStream
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q264_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        NearDedupStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        NearDedupStream.deleteBatch(spark, idx,
          d.filter(col("doc_id") % 2 === 0 && col("doc_id") % 8 === 0)
            .select(col("doc_id")),
          "doc_id", batchId = 0L)
        NearDedupStream.purgeTombstones(spark, idx)
        NearDedupStream.nearDedupBatch(
            d.filter(col("doc_id") % 2 === 1), idx, "doc_id", "text")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(incNearDedupOracle(" AND o.doc_id % 8 <> 0"))),

    GraftQuery(
      "q33_simhash_near_dups",
      "SimHash pairs with Hamming <= 2 via block-partition bucketing " +
        "(exact, no O(n^2) scan); oracle is the brute-force cross join.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.simhashNearDups(d, "doc_id", "text", maxHamming = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(raw"""
        WITH W AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS wd FROM documents),
        H AS (SELECT doc_id, md5(wd) AS h FROM W),
        B AS (
          SELECT doc_id, t.k AS k,
                 SUM(CASE WHEN substr(h, CAST(t.k AS INTEGER), 1)
                          IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
          FROM H, unnest(range(1, 33)) AS t(k)
          GROUP BY doc_id, t.k),
        SH AS (
          SELECT doc_id,
                 SUM(CASE WHEN s > 0 THEN CAST(POW(2, k - 1) AS BIGINT) ELSE 0 END) AS simhash
          FROM B GROUP BY doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM SH a JOIN SH b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        ORDER BY id_a, id_b""")),

    GraftQuery(
      "q52_minhash_sketch_agg",
      "MinHash sketch via the raw-buffer TypedImperativeAggregate UDAF " +
        "(SQL-registered `minhash_sketch`), md5chunk16 family — the " +
        "engine-agnostic hash family makes the sketch values themselves " +
        "DuckDB-reproducible, so the UDAF (update/merge/serialize across " +
        "partial aggregation) is hash-exact against the oracle, not just " +
        "rows-only. The murmur64 production family stays spec-covered.",
      (spark, dir) => {
        graft.GraftFunctions.register(spark)
        val d = Tables.table(spark, dir, "documents")
        Dedup.shingleTable(d, "doc_id", "text")
          .createOrReplaceTempView("q52_shingles")
        spark.sql("""
          SELECT doc_id,
                 sk[0] AS h0, sk[1] AS h1, sk[2] AS h2, sk[3] AS h3,
                 sk[4] AS h4, sk[5] AS h5, sk[6] AS h6, sk[7] AS h7
          FROM (SELECT doc_id, minhash_sketch(g, 8, 'md5chunk16') AS sk
                FROM q52_shingles GROUP BY doc_id)
          ORDER BY doc_id""")
      },
      Some(shingleCte + raw""",
        H AS (SELECT doc_id, md5(g) AS hg FROM S)
        SELECT doc_id,
               min(CAST(('0x' || substr(hg, 1, 4)) AS BIGINT)) AS h0,
               min(CAST(('0x' || substr(hg, 5, 4)) AS BIGINT)) AS h1,
               min(CAST(('0x' || substr(hg, 9, 4)) AS BIGINT)) AS h2,
               min(CAST(('0x' || substr(hg, 13, 4)) AS BIGINT)) AS h3,
               min(CAST(('0x' || substr(hg, 17, 4)) AS BIGINT)) AS h4,
               min(CAST(('0x' || substr(hg, 21, 4)) AS BIGINT)) AS h5,
               min(CAST(('0x' || substr(hg, 25, 4)) AS BIGINT)) AS h6,
               min(CAST(('0x' || substr(hg, 29, 4)) AS BIGINT)) AS h7
        FROM H GROUP BY doc_id ORDER BY doc_id""")),

    GraftQuery(
      "q57_sketch_estimate_dups",
      "Estimate-based near-dedup: LSH candidate pairs scored by MinHash " +
        "sketch agreement (md5chunk16 UDAF; n_agree/8 estimates Jaccard, " +
        "kept at >= 4/8) — O(k) per pair instead of O(shingles) exact " +
        "verification.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.sketchEstimatePairs(d, "doc_id", "text", k = 8, minAgree = 4)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(shingleCte + raw""",
        H AS (SELECT doc_id, md5(g) AS hg FROM S),
        SIG AS (
          SELECT doc_id,
                 min(substr(hg, 1, 4)) AS h0, min(substr(hg, 5, 4)) AS h1,
                 min(substr(hg, 9, 4)) AS h2, min(substr(hg, 13, 4)) AS h3,
                 min(substr(hg, 17, 4)) AS h4, min(substr(hg, 21, 4)) AS h5,
                 min(substr(hg, 25, 4)) AS h6, min(substr(hg, 29, 4)) AS h7
          FROM H GROUP BY doc_id),
        B AS (
          SELECT doc_id, t.b AS band,
                 CASE t.b WHEN 0 THEN md5(h0 || h1) WHEN 1 THEN md5(h2 || h3)
                          WHEN 2 THEN md5(h4 || h5) ELSE md5(h6 || h7) END AS bv
          FROM SIG, unnest([0, 1, 2, 3]) AS t(b)),
        PAIRS AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM B x JOIN B y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id),
        EST AS (
          SELECT id_a, id_b,
                 CAST(
                   (CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
          FROM PAIRS JOIN SIG a ON PAIRS.id_a = a.doc_id
                     JOIN SIG b ON PAIRS.id_b = b.doc_id)
        SELECT id_a, id_b, n_agree FROM EST
        WHERE n_agree >= 4 ORDER BY id_a, id_b""")),

    GraftQuery(
      "q64_incremental_dedup_bloom",
      "q49's incremental dedup through the explicit bloom runtime " +
        "filter: the new batch's fingerprints aggregate into a bloom " +
        "sketch that prunes the accumulated index scan BEFORE the " +
        "anti-join shuffle. No false negatives, so the oracle is the " +
        "same exact-dedup SQL — fpp trades shuffle volume, never rows.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val index = Dedup.exactGroups(d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
          .select(col("fp"))
        Dedup.dedupAgainstIndexBloom(
            d.filter(col("doc_id") % 2 === 1), index, "doc_id", "text")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH IDX AS (
          SELECT DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE doc_id % 2 = 0),
        NEW AS (
          SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE doc_id % 2 = 1),
        S AS (SELECT doc_id, fp FROM NEW n
              WHERE NOT EXISTS (SELECT 1 FROM IDX i WHERE i.fp = n.fp))
        SELECT doc_id FROM S
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)
        ORDER BY doc_id""")),

    GraftQuery(
      "q72_dup_clusters",
      "Duplicate clusters: connected components (min-label propagation, " +
        "rounds = cluster diameter) over the LSH-verified pair list; " +
        "every doc labeled with its component's min id, singletons " +
        "included. Oracle is a DuckDB recursive CTE over the same edges.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val edges = Dedup.jaccardOnCandidates(d, "doc_id", "text", p = 1, q = 2)
        Clusters.connectedComponents(d.select(col("doc_id")), "doc_id", edges)
          .orderBy(col("doc_id"))
      },
      Some(shingleCte.replaceFirst("WITH", "WITH RECURSIVE") + "," + clusterCte + raw"""
        SELECT id AS doc_id, min(r) AS cluster_id
        FROM REACH GROUP BY id ORDER BY doc_id""")),

    GraftQuery(
      "q73_cluster_canonical",
      "Quality-aware cluster dedup: one keeper per duplicate cluster, " +
        "chosen by highest quality score then min id — the policy " +
        "pairwise min-id dedup cannot express. Composes q72's components " +
        "with q18's quality scores; the rank window partitions by " +
        "cluster (bounded groups), never the corpus.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val edges = Dedup.jaccardOnCandidates(d, "doc_id", "text", p = 1, q = 2)
        val cc = Clusters.connectedComponents(d.select(col("doc_id")), "doc_id", edges)
        val quality = graft.functions.TextAnalysis.qualityByDoc(d, "doc_id", "text")
        Clusters.keepersByScore(cc, quality, "doc_id", "quality")
          .orderBy(col("doc_id"))
      },
      Some(shingleCte.replaceFirst("WITH", "WITH RECURSIVE") + "," + clusterCte + raw""",
        CC AS (SELECT id AS doc_id, min(r) AS cluster_id
               FROM REACH GROUP BY id),
        QW AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
               FROM documents),
        QS AS (
          SELECT doc_id,
                 CAST(length(text) AS DOUBLE) AS n_chars,
                 CAST(len(w) AS DOUBLE) AS n_tokens,
                 CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) AS n_alpha,
                 CAST(len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and')) + len(list_filter(w, x -> x = 'of')) AS DOUBLE) AS stop_hits
          FROM QW),
        Q AS (
          SELECT doc_id,
                 CAST(0.4 AS DOUBLE) * least(n_tokens / CAST(64.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
                 + CAST(0.3 AS DOUBLE) * (n_alpha / n_chars)
                 + CAST(0.3 AS DOUBLE) * least(stop_hits * CAST(8.0 AS DOUBLE) / n_tokens, CAST(1.0 AS DOUBLE)) AS quality
          FROM QS)
        SELECT CC.doc_id AS doc_id, CC.cluster_id AS cluster_id, Q.quality AS quality
        FROM CC JOIN Q ON CC.doc_id = Q.doc_id
        QUALIFY row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, CC.doc_id) = 1
        ORDER BY doc_id""")),

    GraftQuery(
      "q134_cluster_safe_split",
      "LEAKAGE-FREE train/test split — the ML-hygiene composition of " +
        "q72's duplicate clusters and q47's content-stable split: the " +
        "split decision hashes the CLUSTER id (each component's min " +
        "label), not the document id, so near-duplicates can never " +
        "straddle the train/test boundary and leak evaluation data " +
        "into training (the failure mode a doc-level split has " +
        "whenever dedup is imperfect or deliberately lenient). " +
        "Singletons degrade to exactly q47's per-doc behavior. Same " +
        "banded-LSH + verify edge discovery, same min-label " +
        "propagation, one extra md5 per cluster — nothing new " +
        "shuffles at 100 TB.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val edges = Dedup.jaccardOnCandidates(d, "doc_id", "text", p = 1, q = 2)
        val cc = Clusters.connectedComponents(
          d.select(col("doc_id")), "doc_id", edges)
        graft.pipeline.Sampling.withSplit(cc, "cluster_id", testFrac = 0.2)
          .select(col("doc_id"), col("cluster_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some(shingleCte.replaceFirst("WITH", "WITH RECURSIVE") + "," + clusterCte + raw""",
        CC AS (SELECT id AS doc_id, min(r) AS cluster_id
               FROM REACH GROUP BY id)
        SELECT doc_id, cluster_id,
               CASE WHEN substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 8) < '33333333'
                    THEN 'test' ELSE 'train' END AS split
        FROM CC ORDER BY doc_id""")),

    GraftQuery(
      "q80_dedup_report",
      "Per-source duplication dashboard: doc count, within-source " +
        "distinct-content count on the canonical fingerprint, duplicate " +
        "fraction. One (source, fp) hash agg + per-source rollup — " +
        "no text shuffled.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.dedupReport(d, "source", "text").orderBy(col("source"))
      },
      Some(raw"""
        WITH F AS (
          SELECT source, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
                 count(*) AS n
          FROM documents GROUP BY 1, 2)
        SELECT source,
               CAST(sum(n) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_unique,
               CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_rate
        FROM F GROUP BY source
        ORDER BY source""")),

    GraftQuery(
      "q138_edit_distance_pairs",
      "COMPLETE levenshtein<=1 pair mining over the token vocabulary " +
        "(Dedup.editDistancePairs) — the typo/variant merge pass (OCR " +
        "noise, casing drift) that string-edit distance covers and " +
        "shingle Jaccard does not. Blocking is the union of two EQUI-" +
        "joins (same first char / same last char, +-1 length band), " +
        "which is PROVABLY lossless for edit distance 1 over terms of " +
        "length >= 2: any single substitution, insert, or delete " +
        "preserves the first character unless it touches position 0, " +
        "and then it preserves the last. So the hash gate checks true " +
        "completeness — the oracle mines the same pairs with DuckDB's " +
        "own levenshtein — while the plan never forms an all-pairs " +
        "product (spec-asserted no-cartesian): candidate fan-out is " +
        "block-bounded and VOCABULARY-bounded, never corpus-bounded.",
      (spark, dir) => {
        // cross-domain vocabulary: document tokens + part-name words —
        // the variant-merge pass runs over every string domain a
        // pipeline ingests, not one table's
        val vocab = Tables.table(spark, dir, "documents")
          .select(explode(
            graft.functions.TextFunctions.words(col("text"))).as("w"))
          .union(Tables.table(spark, dir, "part")
            .select(explode(
              graft.functions.TextFunctions.words(col("p_name"))).as("w")))
        Dedup.editDistancePairs(vocab, "w")
          .orderBy(col("a"), col("b"))
      },
      Some(raw"""
        WITH V AS (SELECT DISTINCT t FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents
          UNION ALL
          SELECT unnest(string_split_regex(trim(p_name), '\s+')) AS t FROM part)),
        V2 AS (SELECT t FROM V WHERE length(t) >= 2)
        SELECT a.t AS a, b.t AS b
        FROM V2 a JOIN V2 b
          ON a.t < b.t
         AND (substr(a.t, 1, 1) = substr(b.t, 1, 1)
              OR substr(a.t, -1, 1) = substr(b.t, -1, 1))
         AND abs(length(a.t) - length(b.t)) <= 1
         AND levenshtein(a.t, b.t) <= 1
        ORDER BY a, b""")),

    GraftQuery(
      "q148_containment_pairs",
      "DIRECTIONAL shingle containment (Dedup.containmentPairs) — the " +
        "quote/boilerplate detector Jaccard structurally misses: a " +
        "short doc fully quoted inside a long one has tiny Jaccard " +
        "(the union IS the long doc) but containment |A-and-B|/|A| " +
        "near 1, so near-dedup alone never finds it. Pairs at 80% " +
        "containment (integer threshold common*10 >= 8*|A|) over the " +
        "df-capped 3-shingle space; the df cap bounds the inverted-" +
        "index join's per-shingle fan-out — common boilerplate " +
        "n-grams are exactly the hot keys — and is applied to sizes " +
        "and intersections alike, keeping the operator a pure " +
        "function the oracle mirrors shingle for shingle.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.containmentPairs(d, "doc_id", "text", p = 8, q = 10,
            shingleN = 3, maxDf = 100)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        SH AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS sh
               FROM W),
        DF AS (SELECT sh, count(*) AS df FROM SH GROUP BY sh),
        SC AS (SELECT sh FROM DF WHERE df <= 100),
        S2 AS (SELECT doc_id, s.sh FROM SH s JOIN SC USING (sh)),
        SZ AS (SELECT doc_id, count(*) AS n FROM S2 GROUP BY doc_id),
        CM AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
               FROM S2 a JOIN S2 b ON a.sh = b.sh AND a.doc_id <> b.doc_id
               GROUP BY 1, 2)
        SELECT c.id_a, c.id_b, CAST(c.common AS BIGINT) AS common,
               CAST(sa.n AS BIGINT) AS size_a
        FROM CM c JOIN SZ sa ON sa.doc_id = c.id_a
        WHERE c.common * 10 >= 8 * sa.n
        ORDER BY id_a, id_b"""))
  ,

    GraftQuery(
      "q149_jaro_winkler_linkage",
      "Blocked Jaro-Winkler best-match name linkage " +
        "(Dedup.jaroWinklerBestMatch) over DISTINCT part names — the " +
        "fuzzy entity-matching pass q138's levenshtein<=1 mining " +
        "cannot rank: JW is a prefix-weighted [0,1] score, the " +
        "standard name-matching bias. The scorer is a native codegen " +
        "Expression (functions.JaroWinklerSim) whose arithmetic order " +
        "is bit-identical to DuckDB's jaro_winkler_similarity " +
        "(verified zero-ULP on a 240k-pair candidate set), so the " +
        "oracle compares exact micro-unit scores with no tolerance " +
        "gate. The distinct-name domain is the scale point: name " +
        "vocabularies grow sub-linearly in records, so the O(len^2) " +
        "kernel runs per VOCAB pair (~200 calls) — a per-record " +
        "variant measured 13.7s at sf0.1 re-scoring identical " +
        "strings 24M times. Blocking = first token + length band " +
        "(bounded equi-join, never cartesian; spec-asserted); each " +
        "name reports its best match, candidate count, and record " +
        "support.",
      (spark, dir) => {
        Dedup.jaroWinklerBestMatch(
            Tables.table(spark, dir, "part"), "p_name")
          .orderBy(col("name"))
      },
      Some("""
        WITH P AS (SELECT p_name AS nm, count(*) AS n_rows
                   FROM part GROUP BY p_name),
        B AS (SELECT nm, n_rows, split_part(nm, ' ', 1) AS blk,
                     length(nm) AS ln FROM P),
        C AS (SELECT a.nm AS na, b.nm AS nb,
                     CAST(round(jaro_winkler_similarity(a.nm, b.nm) * 1000000)
                          AS BIGINT) AS jw
              FROM B a JOIN B b
                ON a.blk = b.blk AND a.nm < b.nm AND abs(a.ln - b.ln) <= 2),
        F AS (SELECT na, nb, jw FROM C WHERE jw >= 850000),
        M AS (SELECT na AS nm, nb AS mk, jw FROM F
              UNION ALL SELECT nb AS nm, na AS mk, jw FROM F),
        R AS (SELECT nm, mk, jw,
                     row_number() OVER (PARTITION BY nm
                                        ORDER BY jw DESC, mk) AS rn,
                     count(*) OVER (PARTITION BY nm) AS n_cands
              FROM M)
        SELECT r.nm AS name, r.mk AS match_name, r.jw AS jw_micros,
               CAST(r.n_cands AS BIGINT) AS n_cands,
               CAST(p.n_rows AS BIGINT) AS n_rows
        FROM R r JOIN P p ON p.nm = r.nm
        WHERE r.rn = 1 ORDER BY name""")),

    GraftQuery(
      "q161_prefix_filter_join",
      "EXACT set-similarity join via prefix filtering " +
        "(Dedup.prefixFilterJoin; SSJoin/PPJoin family) — all document " +
        "pairs at shingle-Jaccard >= 0.8 found deterministically, the " +
        "exact complement of LSH's probabilistic candidates (q21/q43): " +
        "sets order by ascending df (rarest first, one global order), " +
        "only the n - ceil(0.8n) + 1 prefix elements join, and the " +
        "prefix-filter theorem makes that LOSSLESS at the threshold. " +
        "The oracle PROVES completeness per run: it mines the same " +
        "pairs with NO prefix filter (full inverted index), so any " +
        "pair the prefix join missed hash-mismatches. Candidate " +
        "fan-out rides the df of each set's RAREST shingles — the " +
        "opposite cost profile of the naive index's hottest-key " +
        "sum(df^2); verification intersects the two set arrays per " +
        "candidate row (codegen'd), never re-exploding, and the " +
        "threshold compare is pure-integer (10*common >= 8*union).",
      (spark, dir) => {
        Dedup.prefixFilterJoin(
            Tables.table(spark, dir, "documents"), "doc_id", "text",
            p = 8, q = 10, shingleN = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                   FROM documents),
        SH AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(w[i:i+2], ' ')
                              for i in range(1, len(w)-1)]) AS sh
               FROM W),
        SZ AS (SELECT doc_id, count(*) AS n FROM SH GROUP BY doc_id),
        I AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
              FROM SH a JOIN SH b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
        SELECT i.id_a, i.id_b, CAST(i.common AS BIGINT) AS common,
               CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
        FROM I i JOIN SZ sa ON sa.doc_id = i.id_a
                 JOIN SZ sb ON sb.doc_id = i.id_b
        WHERE i.common * 10 >= (sa.n + sb.n - i.common) * 8
        ORDER BY id_a, id_b""")),

    GraftQuery(
      "q171_multi_signal_clusters",
      "MULTI-SIGNAL duplicate clusters — the real pipeline's dedup " +
        "graph unions evidence from different detectors before " +
        "clustering (lexical near-dup and embedding near-dup each " +
        "miss pairs the other finds: paraphrases have low Jaccard, " +
        "topic-similar-but-distinct docs can have high Jaccard " +
        "fragments): q43's LSH-verified Jaccard pairs UNION q24's " +
        "cosine pairs (vec_id == doc_id alignment) feed q72's " +
        "connected components, and the census reports per cluster " +
        "its size plus WHICH signals contributed — the audit view " +
        "that tells you what each detector buys. Edge construction " +
        "stays banded/bucketed (never all-pairs); the census is " +
        "cluster-cardinality sized.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val e = Tables.table(spark, dir, "embeddings")
        // edges materialize ONCE (bounded verified-pair lists): each
        // feeds the component iteration AND its census flag join —
        // lazily both detector pipelines would re-run per consumer
        val lsh = Dedup.jaccardOnCandidates(d, "doc_id", "text", p = 1, q = 2)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint(true)
        val cos = Dedup.embeddingNearDups(e, "vec_id", "embedding", threshold = 0.45)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint(true)
        val cc = Clusters.connectedComponents(
          d.select(col("doc_id")), "doc_id",
          lsh.unionByName(cos).distinct())
        val sz = cc.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("size"))
        def flag(edges: org.apache.spark.sql.DataFrame, name: String) =
          edges.join(cc, edges("id_a") === cc("doc_id"))
            .select(col("cluster_id")).distinct()
            .withColumn(name, lit(true))
        sz.join(flag(lsh, "has_jaccard"), Seq("cluster_id"), "left")
          .join(flag(cos, "has_cosine"), Seq("cluster_id"), "left")
          .select(col("cluster_id"), col("size"),
            coalesce(col("has_jaccard"), lit(false)).as("has_jaccard"),
            coalesce(col("has_cosine"), lit(false)).as("has_cosine"))
          .orderBy(col("cluster_id"))
      },
      Some(shingleCte.replaceFirst("WITH", "WITH RECURSIVE") + "," + edgeCte + raw""",
        EMB AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
        ALLE AS (SELECT id_a, id_b FROM E UNION SELECT id_a, id_b FROM EMB),
        SYM2 AS (SELECT id_a AS src, id_b AS dst FROM ALLE
                 UNION ALL SELECT id_b AS src, id_a AS dst FROM ALLE),
        REACH2 AS (
          SELECT doc_id AS id, doc_id AS r FROM documents
          UNION
          SELECT sy.dst AS id, REACH2.r AS r
          FROM SYM2 sy JOIN REACH2 ON REACH2.id = sy.src),
        CID AS (SELECT id AS doc_id, min(r) AS cid FROM REACH2 GROUP BY id),
        SZ AS (SELECT cid, count(*) AS size FROM CID GROUP BY cid),
        JF AS (SELECT DISTINCT c.cid FROM E e JOIN CID c ON c.doc_id = e.id_a),
        CF AS (SELECT DISTINCT c.cid FROM EMB e JOIN CID c ON c.doc_id = e.id_a)
        SELECT s.cid AS cluster_id, CAST(s.size AS BIGINT) AS size,
               (jf.cid IS NOT NULL) AS has_jaccard,
               (cf.cid IS NOT NULL) AS has_cosine
        FROM SZ s LEFT JOIN JF jf ON jf.cid = s.cid
                  LEFT JOIN CF cf ON cf.cid = s.cid
        ORDER BY cluster_id""")),

    GraftQuery(
      "q176_snm_pairs",
      "Sorted-neighborhood candidate pairs (Hernandez-Stolfo SNM, " +
        "operators.SortedNeighborhood) — the third blocking strategy " +
        "next to LSH (content buckets, q22) and prefix-filtering " +
        "(rare shingles, q161): sort by a fuzzy 10-char key prefix " +
        "and pair every doc with its 3 successors in the sorted " +
        "order, so candidates are bounded at exactly n*w under ANY " +
        "key skew. The global rank is computed DISTRIBUTIVELY " +
        "(range-repartition + per-partition counts + broadcast " +
        "prefix-sum offsets — never a single-partition window), and " +
        "pairing is one bounded explode + one integer rank equi-join. " +
        "same_key self-diagnoses fuzzy vs exact-block matches.",
      (spark, dir) => {
        import graft.operators.SortedNeighborhood
        SortedNeighborhood.snmPairs(
            Tables.table(spark, dir, "documents"),
            substring(lower(trim(col("text"))), 1, 10), col("doc_id"), w = 3)
          .select(col("id_a"), col("id_b"), col("dist"), col("same_key"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        WITH K AS (SELECT doc_id, substr(lower(trim(text)), 1, 10) AS k
                   FROM documents),
        R AS (SELECT doc_id, k,
                     row_number() OVER (ORDER BY k, doc_id) AS r
              FROM K)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(b.r - a.r AS BIGINT) AS dist,
               (a.k = b.k) AS same_key
        FROM R a JOIN R b ON b.r > a.r AND b.r <= a.r + 3
        ORDER BY id_a, id_b"""))
  )
}
