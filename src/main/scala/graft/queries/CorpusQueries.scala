package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.corpus.CorpusOps
import graft.dedup.Dedup

/** Corpus-curation operator verification: sub-document span dedup,
  * benchmark decontamination, repetition quality rules, per-source
  * quotas. Constructions are integer/string-exact (md5 winners, count
  * ratios, deterministic orders) so every oracle is hash-exact.
  */
object CorpusQueries {

  /** Shared by q102 (batch BM25), q103 (the same ranking served from
    * the durable postings store — BM25's statistics are associative
    * integer aggregates of postings rows, so the streamed store serves
    * the IDENTICAL ranking), and q104 (the RRF fusion, whose BM25 arm
    * these CTEs are): one definition so the formula can never drift.
    * DF's HAVING mirrors the Scala side's maxPostings=100000 default
    * (saturated stopword terms dropped from scoring) — without it the
    * oracle would diverge at any SF where a term tops 100k documents.
    * (No SQL comments in oracle strings: normalize() folds them to one
    * line, and a `--` would comment out the rest of the query.) */
  /** Shared VERBATIM by q113 (join-based [[graft.corpus.CorpusOps.unigramSurprisal]])
    * and q117 (the row-local frozen-table twin): scoring a corpus
    * against its own unigram table has no OOV, so the two forms are
    * bit-identical by construction — one oracle pins both. */
  private val unigramOracle: String = raw"""
        WITH T AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
                   FROM documents),
        TF AS (SELECT doc_id, term, count(*) AS tf FROM T GROUP BY doc_id, term),
        C AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM TF GROUP BY term),
        N AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM C),
        I AS (SELECT term, CAST(length(bin(n // c)) - 1 AS BIGINT) AS bits
              FROM C, N)
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               CAST(sum(tf * bits) AS BIGINT) AS info_bits,
               CAST(sum(tf * bits) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS mean_bits
        FROM TF JOIN I USING (term)
        GROUP BY doc_id ORDER BY doc_id"""

  private val bm25Ctes: String = raw"""
        W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        T AS (SELECT doc_id, unnest(w) AS term FROM W),
        TF AS (SELECT doc_id, term, count(*) AS tf FROM T GROUP BY 1, 2),
        LEN AS (SELECT doc_id, sum(tf) AS len FROM TF GROUP BY 1),
        G AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM LEN),
        QT AS (SELECT DISTINCT doc_id AS query_id, term FROM T WHERE doc_id % 100 = 0),
        DF AS (SELECT term, count(*) AS df FROM TF GROUP BY 1
               HAVING count(*) <= 100000),
        S AS (
          SELECT qt.query_id, tf.doc_id,
                 SUM(ln(1 + (g.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * len.len / g.avgdl))) AS score
          FROM TF tf
          JOIN QT qt ON qt.term = tf.term AND tf.doc_id <> qt.query_id
          JOIN DF df ON df.term = tf.term
          JOIN LEN len ON len.doc_id = tf.doc_id
          CROSS JOIN G g
          GROUP BY 1, 2),
        R AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS rank
              FROM S)"""

  private val bm25Oracle: String = s"""
        WITH $bm25Ctes
        SELECT query_id, rank, doc_id FROM R
        WHERE rank <= 5 ORDER BY query_id, rank"""

  /** q102's oracle restricted to the even-id SEED half — the truth an
    * AS-OF-the-seed read must reproduce (q222). Derived from
    * [[bm25Ctes]] by filtering the corpus CTE, so the scoring text
    * stays shared verbatim with q102/q103/q163. */
  private val bm25SeedOracle: String = {
    val seeded = bm25Ctes.replace(
      "FROM documents)", "FROM documents WHERE doc_id % 2 = 0)")
    require(seeded != bm25Ctes, "bm25Ctes corpus clause moved; fix the seed filter")
    s"""
        WITH $seeded
        SELECT query_id, rank, doc_id FROM R
        WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** q102's oracle over the corpus MINUS the tombstoned ids — the
    * truth both the masked serve (q256) and the purged store (q257)
    * must reproduce, shared verbatim between them exactly as
    * q249/q251 share theirs. Derived from [[bm25Ctes]] by filtering
    * the corpus CTE, so the scoring text stays shared with
    * q102/q103/q163/q222. Query ids (% 100 = 0) are never % 10 = 3,
    * so every query doc survives; min rank-5/6 score gap 1.3e-4 at
    * sf0.1 (4.7e-3/3.1e-3 at the smaller SFs), orders above double
    * summation noise. */
  private val bm25DeletedOracle: String = {
    val masked = bm25Ctes.replace(
      "FROM documents)", "FROM documents WHERE doc_id % 10 <> 3)")
    require(masked != bm25Ctes, "bm25Ctes corpus clause moved; fix the delete filter")
    s"""
        WITH $masked
        SELECT query_id, rank, doc_id FROM R
        WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q53_span_dedup",
      "C4-style sub-document dedup: 8-word spans deduped across the " +
        "whole corpus (global first-occurrence winner by md5 window), " +
        "documents reassembled from surviving spans.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.spanDedup(d, "doc_id", "text", spanWords = 8)
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        SPL AS (SELECT doc_id,
                       [array_to_string(w[i*8+1:i*8+8], ' ')
                        for i in range(0, CAST(ceil(len(w)/8.0) AS INT))] AS spans
                FROM W),
        SP AS (SELECT doc_id, unnest(spans) AS span,
                      unnest(range(0, len(spans))) AS span_id FROM SPL),
        K AS (SELECT doc_id, span_id, span FROM SP
              QUALIFY row_number() OVER (PARTITION BY span ORDER BY doc_id, span_id) = 1)
        SELECT doc_id, string_agg(span, ' ' ORDER BY span_id) AS clean_text,
               count(*) AS n_spans
        FROM K GROUP BY doc_id ORDER BY doc_id""")),

    GraftQuery(
      "q54_decontaminate",
      "Benchmark decontamination: corpus docs sharing ANY word-4-gram " +
        "with the benchmark slice (doc_id % 10 = 7) are dropped; the " +
        "benchmark n-gram set is broadcast, the corpus scanned once.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val corpus = d.filter(col("doc_id") % 10 =!= 7)
        val bench = d.filter(col("doc_id") % 10 === 7)
        CorpusOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 4)
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH CORPUS AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
        BENCH AS (SELECT * FROM documents WHERE doc_id % 10 = 7),
        CW AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM CORPUS),
        CS AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
               FROM CW),
        BW AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM BENCH),
        BS AS (SELECT DISTINCT
                      unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
               FROM BW),
        CONTAM AS (SELECT DISTINCT doc_id FROM CS WHERE g IN (SELECT g FROM BS))
        SELECT doc_id FROM CORPUS
        WHERE NOT EXISTS (SELECT 1 FROM CONTAM c WHERE c.doc_id = CORPUS.doc_id)
        ORDER BY doc_id""")),

    GraftQuery(
      "q55_repetition_stats",
      "Gopher-style repetition quality stats per doc: duplicate-word " +
        "fraction, top-word share, duplicate-2-gram fraction, mean word " +
        "length — ratios of exact integer counts (bit-identical doubles " +
        "across engines).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.repetitionStats(d, "doc_id", "text").orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        T AS (SELECT doc_id, unnest(w) AS word FROM W),
        WC AS (SELECT doc_id, word, count(*) AS c FROM T GROUP BY 1, 2),
        WS AS (SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct,
                      MAX(c) AS max_word_c, SUM(length(word) * c) AS len_sum
               FROM WC GROUP BY doc_id),
        B AS (SELECT doc_id, array_to_string(w[i+1:i+2], ' ') AS g2
              FROM W, unnest(range(0, len(w) - 1)) AS t(i)),
        BC AS (SELECT doc_id, g2, count(*) AS c2 FROM B GROUP BY 1, 2),
        BS AS (SELECT doc_id, SUM(c2) AS n_2grams, COUNT(*) AS d_2grams FROM BC GROUP BY doc_id)
        SELECT WS.doc_id,
               CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac,
               CAST(max_word_c AS DOUBLE) / n_words AS top_word_frac,
               CAST(n_2grams - d_2grams AS DOUBLE) / n_2grams AS dup_2gram_frac,
               CAST(len_sum AS DOUBLE) / n_words AS mean_word_len
        FROM WS JOIN BS ON WS.doc_id = BS.doc_id ORDER BY WS.doc_id""")),

    GraftQuery(
      "q56_source_quota",
      "Per-source quota: first 10 docs per source by doc id (rank " +
        "window; the corpus-mixing guard against one domain flooding " +
        "the mix).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.perSourceQuota(d, "source", "doc_id", k = 10)
          .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, source FROM documents
        QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10
        ORDER BY doc_id""")),

    GraftQuery(
      "q58_corpus_curate",
      "Composed corpus-curation pass: exact dedup -> benchmark " +
        "decontamination -> repetition-rule filter -> per-source quota; " +
        "oracle rebuilds all four stages independently in SQL.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.curate(
            d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
            "doc_id", "text", "source",
            shingleN = 4, maxDupWordFrac = 0.6, maxDup2GramFrac = 0.05, quotaK = 10)
          .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH CORPUS AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
        BENCH AS (SELECT * FROM documents WHERE doc_id % 10 = 7),
        D1 AS (SELECT * FROM CORPUS
               QUALIFY doc_id = min(doc_id) OVER (
                 PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g'))))),
        D1W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM D1),
        CS AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
               FROM D1W),
        BW AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM BENCH),
        BGS AS (SELECT DISTINCT
                       unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
                FROM BW),
        CONTAM AS (SELECT DISTINCT doc_id FROM CS WHERE g IN (SELECT g FROM BGS)),
        D2 AS (SELECT * FROM D1
               WHERE NOT EXISTS (SELECT 1 FROM CONTAM c WHERE c.doc_id = D1.doc_id)),
        D2W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM D2),
        T AS (SELECT doc_id, unnest(w) AS word FROM D2W),
        WC AS (SELECT doc_id, word, count(*) AS c FROM T GROUP BY 1, 2),
        WS AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS d FROM WC GROUP BY 1),
        B2 AS (SELECT doc_id, array_to_string(w[i+1:i+2], ' ') AS g2
               FROM D2W, unnest(range(0, len(w) - 1)) AS t(i)),
        BC AS (SELECT doc_id, g2, count(*) AS c2 FROM B2 GROUP BY 1, 2),
        BS2 AS (SELECT doc_id, SUM(c2) AS n2, COUNT(*) AS d2 FROM BC GROUP BY 1),
        D3 AS (SELECT D2.doc_id, D2.source FROM D2
               JOIN WS ON D2.doc_id = WS.doc_id JOIN BS2 ON D2.doc_id = BS2.doc_id
               WHERE CAST(n - d AS DOUBLE) / n <= 0.6
                 AND CAST(n2 - d2 AS DOUBLE) / n2 <= 0.05)
        SELECT doc_id, source FROM D3
        QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10
        ORDER BY doc_id""")),

    GraftQuery(
      "q59_vocabulary",
      "Corpus vocabulary: top-20 terms by document frequency (collection " +
        "frequency riding along, deterministic term tiebreak) — " +
        "TakeOrderedAndProject, no global sort.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.vocabulary(d, "doc_id", "text", k = 20)
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        T AS (SELECT doc_id, unnest(w) AS term FROM W),
        TF AS (SELECT doc_id, term, count(*) AS tf FROM T GROUP BY 1, 2)
        SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
        FROM TF GROUP BY term
        ORDER BY df DESC, term LIMIT 20""")),

    GraftQuery(
      "q94_contamination_rate",
      "Per-doc benchmark contamination report (the fractional " +
        "complement of q54's binary drop): distinct 4-gram count, " +
        "benchmark hits, and the overlap share per corpus doc — the " +
        "audit view a threshold-based decontamination policy tunes on. " +
        "Benchmark grams broadcast, corpus scanned once, one per-doc " +
        "agg; exact integer counts, single double division.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val corpus = d.filter(col("doc_id") % 10 =!= 7)
        val bench = d.filter(col("doc_id") % 10 === 7)
        CorpusOps.contaminationStats(corpus, bench, "doc_id", "text", shingleN = 4)
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH CORPUS AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
        BENCH AS (SELECT * FROM documents WHERE doc_id % 10 = 7),
        CW AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM CORPUS),
        CS AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
               FROM CW),
        BW AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM BENCH),
        BS AS (SELECT DISTINCT
                      unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
               FROM BW)
        SELECT c.doc_id,
               COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               CAST(CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS contamination_rate
        FROM CS c LEFT JOIN BS b ON b.g = c.g
        GROUP BY c.doc_id
        ORDER BY c.doc_id""")),

    GraftQuery(
      "q63_decontaminate_rows",
      "Per-row decontamination (the streaming-capable twin of q54): the " +
        "fused shingle_overlap_set codegen kernel probes each doc's " +
        "4-grams against the benchmark gram set in one tokenize+hash " +
        "pass — same survivor membership as the join form by " +
        "construction, verified against the same oracle.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val corpus = d.filter(col("doc_id") % 10 =!= 7)
        val bench = d.filter(col("doc_id") % 10 === 7)
        val grams = CorpusOps.benchmarkGrams(bench, "doc_id", "text", shingleN = 4)
        CorpusOps.decontaminateRows(corpus, grams, "text", shingleN = 4)
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH CORPUS AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
        BENCH AS (SELECT * FROM documents WHERE doc_id % 10 = 7),
        CW AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM CORPUS),
        CS AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
               FROM CW),
        BW AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM BENCH),
        BS AS (SELECT DISTINCT
                      unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w)-2)]) AS g
               FROM BW),
        CONTAM AS (SELECT DISTINCT doc_id FROM CS WHERE g IN (SELECT g FROM BS))
        SELECT doc_id FROM CORPUS
        WHERE NOT EXISTS (SELECT 1 FROM CONTAM c WHERE c.doc_id = CORPUS.doc_id)
        ORDER BY doc_id""")),

    GraftQuery(
      "q66_boilerplate_removal",
      "C4-style frequent-span removal: 4-word spans occurring in > 2 " +
        "distinct docs are dropped from ALL of them (vs q53's " +
        "keep-first); docs reassembled from survivors. Distinct-doc " +
        "counts via dense_rank max — one exchange, no count(DISTINCT), " +
        "no self-join.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.removeBoilerplate(d, "doc_id", "text", spanWords = 4, maxDocFreq = 2)
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        SPL AS (SELECT doc_id,
                       [array_to_string(w[i*4+1:i*4+4], ' ')
                        for i in range(0, CAST(ceil(len(w)/4.0) AS INT))] AS spans
                FROM W),
        SP AS (SELECT doc_id, unnest(spans) AS span,
                      unnest(range(0, len(spans))) AS span_id FROM SPL),
        DF AS (SELECT span, count(DISTINCT doc_id) AS df FROM SP GROUP BY span),
        K AS (SELECT doc_id, span_id, SP.span FROM SP JOIN DF USING (span) WHERE df <= 2)
        SELECT doc_id, string_agg(span, ' ' ORDER BY span_id) AS clean_text,
               count(*) AS n_spans
        FROM K GROUP BY doc_id ORDER BY doc_id""")),

    GraftQuery(
      "q67_token_df_stats",
      "Corpus-statistics scoring: each doc joined against the corpus " +
        "token document-frequency table (broadcast) — the TF-IDF " +
        "feature-build pass with integer outputs (df sums/extremes per " +
        "doc).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.tokenFrequencyStats(d, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH T AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
                   FROM documents),
        TF AS (SELECT doc_id, term, count(*) AS tf FROM T GROUP BY doc_id, term),
        DF AS (SELECT term, count(*) AS df FROM TF GROUP BY term)
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(min(df) AS BIGINT) AS df_min,
               CAST(max(df) AS BIGINT) AS df_max,
               CAST(sum(tf * df) AS BIGINT) AS df_weight
        FROM TF JOIN DF USING (term)
        GROUP BY doc_id ORDER BY doc_id""")),

    GraftQuery(
      "q70_per_source_topk",
      "Per-source top-3 docs by size through the bounded-heap typed " +
        "UDAF (TopKAggregator: O(k) state per group, map-side partial " +
        "top-k) — the hot-group-safe replacement for q56's rank " +
        "window; the oracle IS the rank window.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.perSourceTopK(d, "source", "n_chars", "doc_id", k = 3)
          .orderBy(col("source"), col("rank"))
      },
      Some("""
        SELECT source,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank,
               doc_id
        FROM documents
        QUALIFY rank <= 3
        ORDER BY source, rank""")),

    GraftQuery(
      "q76_novelty_scores",
      "Per-doc n-gram novelty vs everything ingested before it (doc id " +
        "= ingestion order): share of the doc's distinct trigram " +
        "shingles first seen in a lower-id doc. One shingle-keyed " +
        "shuffle + per-doc agg; zero-shingle docs keep a NULL-novelty " +
        "row by contract.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.noveltyScores(d, "doc_id", "text", shingleN = 3)
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        S AS (SELECT DISTINCT doc_id,
                     unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
              FROM W),
        F AS (SELECT g, min(doc_id) AS first_doc FROM S GROUP BY g),
        A AS (SELECT s.doc_id,
                     count(*) AS n_shingles,
                     SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS n_seen
              FROM S s JOIN F f ON s.g = f.g GROUP BY s.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(coalesce(n_seen, 0) AS BIGINT) AS n_seen,
               CAST(1.0 AS DOUBLE)
                 - CAST(coalesce(n_seen, 0) AS DOUBLE)
                   / nullif(CAST(coalesce(n_shingles, 0) AS DOUBLE), CAST(0.0 AS DOUBLE)) AS novelty
        FROM documents d LEFT JOIN A ON d.doc_id = A.doc_id
        ORDER BY d.doc_id""")),

    GraftQuery(
      "q79_oov_rate",
      "Per-doc out-of-vocabulary rate vs the corpus' own top-20 " +
        "vocabulary (q59's artifact broadcast into a left join) — the " +
        "tokenizer-health / domain-drift signal. Zero-token docs keep a " +
        "NULL-rate row by contract.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.oovStats(d, "doc_id", "text", k = 20)
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        T AS (SELECT doc_id, unnest(w) AS term FROM W),
        TF AS (SELECT doc_id, term, count(*) AS tf FROM T GROUP BY 1, 2),
        V AS (SELECT term FROM (
                SELECT term, count(*) AS df FROM TF GROUP BY term
                ORDER BY df DESC, term LIMIT 20)),
        A AS (SELECT t.doc_id, count(*) AS n_tokens,
                     SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
              FROM T t LEFT JOIN V v ON t.term = v.term GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
               CAST(coalesce(n_oov, 0) AS DOUBLE)
                 / nullif(CAST(coalesce(n_tokens, 0) AS DOUBLE), CAST(0.0 AS DOUBLE)) AS oov_rate
        FROM documents d LEFT JOIN A ON d.doc_id = A.doc_id
        ORDER BY d.doc_id""")),

    GraftQuery(
      "q81_snapshot_diff",
      "Snapshot diff (CDC): two synthetic corpus versions keyed by " +
        "doc_id div 2 (old = even ids minus every 25th key, new = odd " +
        "ids minus every 23rd key) classified added / removed / changed " +
        "/ unchanged by canonical-fingerprint compare — one full-outer " +
        "join shuffling only (key, 16-byte fp), no text.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val keyed = d.withColumn("k", expr("doc_id div 2"))
        val oldSnap = keyed.filter(col("doc_id") % 2 === 0 && col("k") % 25 =!= 0)
        val newSnap = keyed.filter(col("doc_id") % 2 === 1 && col("k") % 23 =!= 0)
        CorpusOps.snapshotDiff(oldSnap, newSnap, "k", "text")
          .orderBy(col("k"))
      },
      Some(raw"""
        WITH O AS (
          SELECT doc_id // 2 AS k, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE doc_id % 2 = 0 AND (doc_id // 2) % 25 <> 0),
        N AS (
          SELECT doc_id // 2 AS k, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE doc_id % 2 = 1 AND (doc_id // 2) % 23 <> 0)
        SELECT coalesce(o.k, n.k) AS k,
               CASE WHEN o.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    WHEN o.fp <> n.fp THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM O o FULL OUTER JOIN N n ON o.k = n.k
        ORDER BY k""")),

    GraftQuery(
      "q82_corpus_health",
      "Per-source corpus health dashboard: docs, distinct content, " +
        "dup rate, english share, high-quality share, token/char " +
        "volume — the monitoring rollup a curation pipeline publishes " +
        "each run. All counters integer (threshold compares on " +
        "bit-identical doubles), rates single divisions; per-doc " +
        "signals join on doc_id, then one per-source agg.",
      (spark, dir) => {
        import graft.functions.{TextAnalysis, TextFunctions}
        val d = Tables.table(spark, dir, "documents")
        val lang = TextAnalysis.langIdByDoc(d, "doc_id", "text")
          .select(col("doc_id"), col("lang_pred"))
        val qual = TextAnalysis.qualityByDoc(d, "doc_id", "text")
        d.select(col("doc_id"), col("source"), col("n_chars"),
            TextFunctions.fingerprint(col("text")).as("fp"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
          .join(lang, "doc_id").join(qual, "doc_id")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("fp")).as("n_unique"),
            sum(when(col("lang_pred") === "en", 1L).otherwise(0L)).as("n_en"),
            sum(when(col("quality") >= 0.5, 1L).otherwise(0L)).as("n_high_quality"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("n_chars")).as("total_chars"))
          .withColumn("dup_rate",
            expr("CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
          .withColumn("avg_chars",
            expr("CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
          .orderBy(col("source"))
      },
      Some(raw"""
        WITH W AS (
          SELECT doc_id, source, n_chars, text,
                 string_split_regex(trim(text), '\s+') AS w
          FROM documents),
        LS AS (
          SELECT doc_id,
                 len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and')) + len(list_filter(w, x -> x = 'of')) AS en,
                 len(list_filter(w, x -> x = 'der')) + len(list_filter(w, x -> x = 'die')) + len(list_filter(w, x -> x = 'und')) AS de,
                 len(list_filter(w, x -> x = 'le')) + len(list_filter(w, x -> x = 'la')) + len(list_filter(w, x -> x = 'et')) AS fr,
                 len(list_filter(w, x -> x = 'el')) + len(list_filter(w, x -> x = 'los')) + len(list_filter(w, x -> x = 'y')) AS es
          FROM W),
        L AS (
          SELECT doc_id,
                 CASE WHEN greatest(en, de, fr, es) <= 0 THEN 'und'
                      WHEN en = greatest(en, de, fr, es) THEN 'en'
                      WHEN de = greatest(en, de, fr, es) THEN 'de'
                      WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                      ELSE 'es' END AS lang_pred
          FROM LS),
        QS AS (
          SELECT doc_id,
                 CAST(length(text) AS DOUBLE) AS q_chars,
                 CAST(len(w) AS DOUBLE) AS q_tokens,
                 CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) AS q_alpha,
                 CAST(len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and')) + len(list_filter(w, x -> x = 'of')) AS DOUBLE) AS stop_hits
          FROM W),
        Q AS (
          SELECT doc_id,
                 CAST(0.4 AS DOUBLE) * least(q_tokens / CAST(64.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
                 + CAST(0.3 AS DOUBLE) * (q_alpha / q_chars)
                 + CAST(0.3 AS DOUBLE) * least(stop_hits * CAST(8.0 AS DOUBLE) / q_tokens, CAST(1.0 AS DOUBLE)) AS quality
          FROM QS),
        P AS (
          SELECT doc_id, source, n_chars, len(w) AS n_tokens,
                 md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM W)
        SELECT p.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT p.fp) AS BIGINT) AS n_unique,
               CAST(SUM(CASE WHEN l.lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
               CAST(SUM(CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality,
               CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(p.n_chars) AS BIGINT) AS total_chars,
               CAST(count(*) - count(DISTINCT p.fp) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS dup_rate,
               CAST(SUM(p.n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
        FROM P p JOIN L l ON p.doc_id = l.doc_id JOIN Q q ON p.doc_id = q.doc_id
        GROUP BY p.source
        ORDER BY p.source""")),

    GraftQuery(
      "q83_tokenize_ids",
      "Materialize training tokens: encode each doc as the id sequence " +
        "of its words under the corpus top-50 vocabulary (id = df rank, " +
        "OOV -> 0, order preserved) — the step between curation and " +
        "token packing. Vocab broadcast; one doc-keyed shuffle; ids " +
        "emitted comma-joined for engine-agnostic compare.",
      (spark, dir) => {
        import spark.implicits._
        import graft.functions.TextFunctions
        val d = Tables.table(spark, dir, "documents")
        // the top-50 vocab ranks on the DRIVER (rows already bounded by
        // the limit): a global window would run single-partition and
        // spam the WindowExec warning — a literal partition key doesn't
        // help, EliminateWindowPartitions folds it away
        val vocab = CorpusOps.vocabulary(d, "doc_id", "text", k = 50)
          .select(col("term"), col("df")).collect()
          .sortBy(r => (-r.getLong(1), r.getString(0)))
          .zipWithIndex
          .map { case (r, i) => (r.getString(0), (i + 1).toLong) }
          .toSeq.toDF("term", "tid")
        val toks = d
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
            posexplode(TextFunctions.words(col("text"))).as(Seq("pos", "term")))
        val enc = toks.join(broadcast(vocab), Seq("term"), "left")
          .groupBy(col("doc_id"))
          .agg(array_join(
            transform(
              sort_array(collect_list(struct(col("pos"),
                coalesce(col("tid"), lit(0L)).as("tid")))),
              x => x("tid").cast("string")), ",").as("ids"))
        d.select(col("doc_id")).join(enc, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("ids"), lit("")).as("ids"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        T AS (SELECT doc_id, t.pos AS pos, w[CAST(t.pos AS INTEGER)] AS term
              FROM W, unnest(range(1, len(w)+1)) AS t(pos)),
        TF AS (SELECT doc_id, term, count(*) AS tf FROM T GROUP BY 1, 2),
        V AS (SELECT term,
                     row_number() OVER (ORDER BY df DESC, term) AS tid
              FROM (SELECT term, count(*) AS df FROM TF GROUP BY term
                    ORDER BY df DESC, term LIMIT 50)),
        E AS (SELECT t.doc_id,
                     string_agg(CAST(coalesce(v.tid, 0) AS VARCHAR), ','
                       ORDER BY t.pos) AS ids
              FROM T t LEFT JOIN V v ON t.term = v.term GROUP BY t.doc_id)
        SELECT d.doc_id, coalesce(e.ids, '') AS ids
        FROM documents d LEFT JOIN E e ON d.doc_id = e.doc_id
        ORDER BY d.doc_id""")),

    GraftQuery(
      "q86_quality_histogram",
      "Quality-score decile histogram (band = floor(quality*10), an " +
        "integer derived identically from the bit-identical score on " +
        "both engines) — the distribution view quality thresholds are " +
        "tuned against.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        graft.functions.TextAnalysis.qualityByDoc(d, "doc_id", "text")
          .withColumn("band", floor(col("quality") * 10).cast("long"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("band"))
      },
      Some(raw"""
        WITH W AS (
          SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents),
        S AS (
          SELECT doc_id,
                 CAST(length(text) AS DOUBLE) AS n_chars,
                 CAST(len(w) AS DOUBLE) AS n_tokens,
                 CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) AS n_alpha,
                 CAST(len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and')) + len(list_filter(w, x -> x = 'of')) AS DOUBLE) AS stop_hits
          FROM W),
        Q AS (
          SELECT doc_id,
                 CAST(0.4 AS DOUBLE) * least(n_tokens / CAST(64.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
                 + CAST(0.3 AS DOUBLE) * (n_alpha / n_chars)
                 + CAST(0.3 AS DOUBLE) * least(stop_hits * CAST(8.0 AS DOUBLE) / n_tokens, CAST(1.0 AS DOUBLE)) AS quality
          FROM S)
        SELECT CAST(floor(quality * 10) AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM Q GROUP BY band ORDER BY band""")),

    GraftQuery(
      "q87_source_overlap",
      "Inter-source n-gram overlap matrix: distinct trigram shingles " +
        "shared by each source pair — the cross-source contamination " +
        "signal. Single scan: distinct (source, shingle), per-shingle " +
        "source set, pair explode (the LSH bucket pattern, groups " +
        "bounded by source count), one rollup. No self-join of the " +
        "shingle pipeline.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        // shingle per doc (id-partitioned explode parallelism), then
        // attach source — shingling BY source would window over
        // |sources| partitions, a 5-task skew
        graft.dedup.Dedup.shingleTable(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("g")).distinct()
          .groupBy(col("g"))
          .agg(sort_array(collect_set(col("source"))).as("ss"))
          .filter(size(col("ss")) > 1)
          .select(explode(expr(
            """flatten(transform(ss, (x, i) ->
              |  transform(slice(ss, i + 2, size(ss) - i - 1),
              |    y -> struct(x AS source_a, y AS source_b))))""".stripMargin)).as("p"))
          .select(col("p.source_a"), col("p.source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some(raw"""
        WITH W AS (SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents),
        SF AS (SELECT DISTINCT source,
                      unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
               FROM W)
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM SF a JOIN SF b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    GraftQuery(
      "q102_bm25_topk",
      "BM25 lexical top-5 retrieval (more-like-this over query docs " +
        "doc_id % 100 = 0, self excluded) — the text-side sibling of " +
        "the embedding ANN family. Postings restricted to the query " +
        "vocabulary by broadcast semi-join BEFORE df counting and " +
        "scoring (the inverted-index access pattern without an index); " +
        "N/avgdl exact integer-derived scalars, so both engines divide " +
        "identical operands; idf+tf-saturation expressions mirrored " +
        "term by term, score-gap margins >> double summation-order " +
        "error, ids-only output.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        graft.corpus.TextRetrieval.bm25TopK(
            d, "doc_id", "text",
            d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25Oracle)),

    GraftQuery(
      "q103_bm25_from_index",
      "BM25 served from the DURABLE streamed postings store " +
        "(PostingsStream, BatchIndex lifecycle): the even-id half is " +
        "backfilled as root seed postings, the odd-id half appended as " +
        "batch 0, and the probe scores from the stored (doc_id, term, " +
        "tf) rows alone — documents never re-read, never re-tokenized. " +
        "Every BM25 statistic is an associative integer aggregate of " +
        "postings rows, so incremental maintenance is EXACT: shares " +
        "q102's oracle verbatim.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q103_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        graft.streaming.PostingsStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        graft.streaming.PostingsStream.appendBatch(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
        graft.streaming.PostingsStream.bm25TopK(
            spark, idx, d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25Oracle)),

    GraftQuery(
      "q163_exactly_once_replay",
      "EXACTLY-ONCE sink semantics through the oracle gate: q103's " +
        "postings build, but batch 0 is DELIVERED TWICE (the " +
        "checkpoint-restart double-delivery every foreachBatch sink " +
        "must survive — after a crash between sink write and " +
        "checkpoint commit, the engine replays the batch). The " +
        "store's per-batch directory overwrite keyed on batchId " +
        "makes redelivery idempotent, so the replayed run serves " +
        "IDENTICAL scores: this query shares q102's oracle verbatim, " +
        "and any duplicate posting row the replay leaked would " +
        "corrupt tf/df/length statistics and hash-mismatch. The " +
        "at-least-once -> exactly-once bridge is the sink contract " +
        "every durable store here builds on (SURVEY §2.8 recovery).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q163_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        graft.streaming.PostingsStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        val odds = d.filter(col("doc_id") % 2 === 1)
        graft.streaming.PostingsStream.appendBatch(
          odds, "doc_id", "text", idx, 0L)
        // the restart: batch 0 arrives again, byte-for-byte
        graft.streaming.PostingsStream.appendBatch(
          odds, "doc_id", "text", idx, 0L)
        graft.streaming.PostingsStream.bm25TopK(
            spark, idx, d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25Oracle)),

    GraftQuery(
      "q222_bm25_asof_seed",
      "AS-OF (time-travel) read of the durable postings store: q103's " +
        "build (even half seeded, odd half appended as batch 0) " +
        "served through PostingsStream.bm25TopKAsOf pinned at the " +
        "SEED fence (asOfBatch = -1) — the read every incremental-" +
        "reprocessing debug session wants, generalized in " +
        "BatchIndex.asOf for every batch=N store. Because all BM25 " +
        "statistics derive from the pinned posting rows, the served " +
        "ranking must be bit-identical to running q102 on the seed " +
        "half alone: the oracle is q102's SQL with the corpus CTE " +
        "filtered to even ids, scoring text shared verbatim. The " +
        "batch-0 rows are PRESENT in the store and must be invisible " +
        "behind the fence — any leak changes tf/df/N/avgdl and " +
        "hash-mismatches.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q222_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        graft.streaming.PostingsStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        graft.streaming.PostingsStream.appendBatch(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
        graft.streaming.PostingsStream.bm25TopKAsOf(
            spark, idx, d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, asOfBatch = -1L, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25SeedOracle)),

    GraftQuery(
      "q256_bm25_store_deletes",
      "Postings-store DELETE path — the takedown half of the lexical " +
        "index's lifecycle, mirroring the vector store's q249: q103's " +
        "build (even half seeded, odd half appended as batch 0), then " +
        "the doc_id % 10 = 3 ids tombstoned as a delete batch (stored " +
        "batch=N under _tombstones/, stamped, fence-composable) and " +
        "served with the tombstone set subtracted BEFORE the BM25 " +
        "statistics derive. Because every statistic is an associative " +
        "integer aggregate of postings rows, deletion is exactly " +
        "decrementable: the served ranking must equal BM25 over a " +
        "corpus that never held the deleted docs — N, avgdl, and df " +
        "all shrink, so even surviving docs' scores move. The oracle " +
        "is q102's SQL with the corpus CTE filtered, scoring text " +
        "shared verbatim.",
      (spark, dir) => {
        import graft.streaming.PostingsStream
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q256_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        PostingsStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        PostingsStream.appendBatch(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
        PostingsStream.deleteBatch(spark, idx,
          d.filter(col("doc_id") % 10 === 3).select(col("doc_id")),
          "doc_id", batchId = 1L)
        PostingsStream.bm25TopK(
            spark, idx, d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25DeletedOracle)),

    GraftQuery(
      "q257_bm25_store_purge",
      "The PHYSICAL half of q256's delete path (q251's posture for " +
        "the lexical store): same build, same doc_id % 10 = 3 " +
        "tombstone batch — but purged. purgeTombstones rewrites the " +
        "WHOLE store (seed + batches) into fresh seed files minus the " +
        "tombstoned ids under compactIndex's crash-safe staging+" +
        "journal protocol and drops the tombstone store; the probe " +
        "then runs with NO masked read. The ranking must equal q256's " +
        "serving-side subtraction exactly (oracle shared verbatim) " +
        "while the deleted postings' bytes are no longer on disk — " +
        "takedown complete, not merely masked.",
      (spark, dir) => {
        import graft.streaming.PostingsStream
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q257_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        PostingsStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        PostingsStream.appendBatch(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
        PostingsStream.deleteBatch(spark, idx,
          d.filter(col("doc_id") % 10 === 3).select(col("doc_id")),
          "doc_id", batchId = 1L)
        PostingsStream.purgeTombstones(spark, idx)
        PostingsStream.bm25TopK(
            spark, idx, d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25DeletedOracle)),

    GraftQuery(
      "q268_bm25_asof_before_delete",
      "The DELETE path under the AS-OF fence — q256's exact build " +
        "(seed + batch 0 + the % 10 = 3 tombstone batch at delete " +
        "batch 1) served PINNED AT BATCH 0, i.e. before the delete " +
        "was admitted: the tombstones are ON DISK and must be " +
        "invisible behind the fence, so the ranking equals q102's " +
        "full-corpus BM25 verbatim (oracle shared with q102/q103/" +
        "q163) while the live read (q256's gate) already serves the " +
        "post-delete statistics. Time travel and takedown compose: " +
        "a pinned debugging read reproduces what the store served " +
        "THEN, not what it is allowed to serve NOW — and the purge " +
        "(q257) is what destroys fenced history when the law needs " +
        "it gone.",
      (spark, dir) => {
        import graft.streaming.PostingsStream
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q268_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        PostingsStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        PostingsStream.appendBatch(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
        PostingsStream.deleteBatch(spark, idx,
          d.filter(col("doc_id") % 10 === 3).select(col("doc_id")),
          "doc_id", batchId = 1L)
        PostingsStream.bm25TopKAsOf(
            spark, idx, d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, asOfBatch = 0L, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(bm25Oracle)),

    GraftQuery(
      "q225_dsir_importance",
      "DSIR-style data selection (hashed-unigram importance " +
        "resampling weights, Xie et al.'s public recipe): every raw " +
        "document scored by the log-likelihood ratio of its tokens " +
        "under target (source = src0) vs raw bucket distributions, " +
        "top-200 selected — the cheap domain-selection pass a 100 TB " +
        "pretraining pipeline runs before expensive curation. " +
        "Buckets are md5-hex prefixes (4096 — both engines hash " +
        "identically); the per-bucket log ratio freezes ONCE to " +
        "integer micro-nats from identical integer operands, so each " +
        "doc weight is an exact integer sum, immune to summation " +
        "order. One tokenize pass, bucket-bounded broadcast table, " +
        "one shuffle on doc id (CorpusOps.importanceWeights).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.importanceWeights(d, "doc_id", "text",
            col("source") === "src0")
          .orderBy(col("weight_micros").desc, col("doc_id"))
          .limit(200)
      },
      Some(raw"""
        WITH TOK AS (
          SELECT doc_id, source = 'src0' AS t,
                 unnest(string_split_regex(trim(text), '\s+')) AS term
          FROM documents),
        TK AS (SELECT doc_id, t, substr(md5(term), 1, 3) AS b
               FROM TOK WHERE term <> ''),
        C AS (SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
                     sum(CASE WHEN t THEN 0 ELSE 1 END) AS cr
              FROM TK GROUP BY b),
        G AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM C),
        LR AS (SELECT b,
                      CAST(round(ln(((ct + 1) * (nr + 4096.0))
                                    / ((cr + 1) * (nt + 4096.0))) * 1000000)
                        AS BIGINT) AS lr_micros
               FROM C CROSS JOIN G),
        W AS (SELECT doc_id, CAST(sum(lr_micros) AS BIGINT) AS weight_micros
              FROM TK JOIN LR USING (b) WHERE NOT t GROUP BY doc_id)
        SELECT doc_id, weight_micros FROM W
        ORDER BY weight_micros DESC, doc_id
        LIMIT 200""")),

    GraftQuery(
      "q104_hybrid_rrf",
      "Hybrid retrieval by reciprocal-rank fusion: BM25 (q102's arm, " +
        "pool 20) and shingle-overlap (distinct shared 3-grams, exact " +
        "integer counts, q87's gram construction) each nominate " +
        "candidates; fusion re-ranks by sum of 1/(60+rank) over the " +
        "nominating lists. The fusion arithmetic is exactly " +
        "reproducible (identical-operand divisions, at most two " +
        "commutative additions) — only the BM25 arm carries score-gap " +
        "margins.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        graft.corpus.TextRetrieval.hybridRrfTopK(
            d, "doc_id", "text",
            d.filter(col("doc_id") % 100 === 0), "doc_id", "text",
            k = 5, poolK = 20, excludeSelf = true)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""
        WITH $bm25Ctes,
        BA AS (SELECT query_id, doc_id, rank FROM R WHERE rank <= 20),
        SH AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
               FROM W),
        QS AS (SELECT doc_id AS query_id, g FROM SH WHERE doc_id % 100 = 0),
        OV AS (SELECT qs.query_id, sh.doc_id, count(*) AS shared
               FROM SH sh JOIN QS qs ON qs.g = sh.g AND sh.doc_id <> qs.query_id
               GROUP BY 1, 2),
        OB AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY shared DESC, doc_id) AS rank
               FROM OV),
        BB AS (SELECT query_id, doc_id, rank FROM OB WHERE rank <= 20),
        F AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
                     coalesce(a.doc_id, b.doc_id) AS doc_id,
                     (CASE WHEN a.rank IS NOT NULL
                           THEN CAST(1.0 AS DOUBLE) / CAST(60 + a.rank AS DOUBLE)
                           ELSE CAST(0.0 AS DOUBLE) END
                      + CASE WHEN b.rank IS NOT NULL
                             THEN CAST(1.0 AS DOUBLE) / CAST(60 + b.rank AS DOUBLE)
                             ELSE CAST(0.0 AS DOUBLE) END) AS score
              FROM BA a FULL OUTER JOIN BB b
                ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
        FR AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id) AS rank
               FROM F)
        SELECT query_id, rank, doc_id FROM FR
        WHERE rank <= 5 ORDER BY query_id, rank""")),

    GraftQuery(
      "q108_hybrid_rrf_from_index",
      "Hybrid more-like-this served ENTIRELY from the durable postings " +
        "store: q103's store (even-id seed + odd-id batch 0) serves " +
        "both fusion arms — stored BM25 and distinct-shared-term " +
        "overlap (the order-free overlap arm computable from (doc_id, " +
        "term) rows alone) — and the query term sets are the query " +
        "docs' OWN stored postings rows, so documents are never read " +
        "or re-tokenized anywhere in the plan (spec-asserted). Fusion " +
        "arithmetic shares q104's exactly-reproducible form.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val idx = QueryScratch.dir("graft_q108_index")
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
        graft.streaming.PostingsStream.backfillIndex(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
        graft.streaming.PostingsStream.appendBatch(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx, 0L)
        val queryIds = graft.streaming.PostingsStream
          .readPostings(spark, idx)
          .select(col("doc_id")).distinct()
          .filter(col("doc_id") % 100 === 0)
        graft.streaming.PostingsStream.moreLikeThis(
            spark, idx, queryIds, "doc_id", k = 5, poolK = 20)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""
        WITH $bm25Ctes,
        BA AS (SELECT query_id, doc_id, rank FROM R WHERE rank <= 20),
        OV AS (SELECT qt.query_id, tf.doc_id, count(*) AS shared
               FROM TF tf JOIN QT qt ON qt.term = tf.term AND tf.doc_id <> qt.query_id
               GROUP BY 1, 2),
        OB AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY shared DESC, doc_id) AS rank
               FROM OV),
        BB AS (SELECT query_id, doc_id, rank FROM OB WHERE rank <= 20),
        F AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
                     coalesce(a.doc_id, b.doc_id) AS doc_id,
                     (CASE WHEN a.rank IS NOT NULL
                           THEN CAST(1.0 AS DOUBLE) / CAST(60 + a.rank AS DOUBLE)
                           ELSE CAST(0.0 AS DOUBLE) END
                      + CASE WHEN b.rank IS NOT NULL
                             THEN CAST(1.0 AS DOUBLE) / CAST(60 + b.rank AS DOUBLE)
                             ELSE CAST(0.0 AS DOUBLE) END) AS score
              FROM BA a FULL OUTER JOIN BB b
                ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
        FR AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id) AS rank
               FROM F)
        SELECT query_id, rank, doc_id FROM FR
        WHERE rank <= 5 ORDER BY query_id, rank""")),

    GraftQuery(
      "q113_unigram_surprisal",
      "Unigram-LM fluency scoring (the CCNet perplexity filter's " +
        "integer-exact unigram form): every token occurrence " +
        "contributes floor(log2(N/count)) bits of self-information " +
        "under the corpus' own unigram distribution — computed exactly " +
        "on integers via bit length (length(bin(N div c)) - 1), no " +
        "transcendentals, so the engines agree bit-for-bit. Fluent " +
        "common-token docs score low mean bits, rare-token gibberish " +
        "high — CCNet's bucket ranking, quantized. One hash agg for " +
        "per-doc tf, a broadcast vocabulary-bounded unigram table, one " +
        "driver-side exact scalar N (the BM25 posture).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        CorpusOps.unigramSurprisal(d, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(unigramOracle)),

    GraftQuery(
      "q117_unigram_surprisal_rowwise",
      "Row-local unigram surprisal against a FROZEN bits table — " +
        "q113's streaming-capable twin, as decontaminateRows is to " +
        "decontaminate (and CCNet's actual deployment shape: train " +
        "the LM once on a reference corpus, score every new shard " +
        "against it). The vocabulary-bounded (term, bits) map rides " +
        "the plan as a literal and each row folds its own token array " +
        "through codegen'd aggregate + element_at — no explode, no " +
        "shuffle, a pure per-row projection that drops into any plan " +
        "shape including a continuous ingest stream. Self-scored here " +
        "(no OOV by construction), so it shares q113's oracle " +
        "verbatim — the two forms cannot drift.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val bits = CorpusOps.unigramBits(d, "doc_id", "text")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        CorpusOps.scoreAgainstUnigramBits(
            d, "doc_id", "text", bits, oovBits = bits.values.max + 1)
          .orderBy(col("doc_id"))
      },
      Some(unigramOracle)),

    GraftQuery(
      "q150_doc_chunking",
      "Overlapping token-window chunking (CorpusOps.chunkTokens) — the " +
        "RAG/pretraining passage splitter: 64-token chunks every 40 " +
        "tokens, so consecutive chunks overlap by 24. Map-only: " +
        "tokenize once, transform over the start sequence, ONE " +
        "posexplode — no join, no shuffle, no per-chunk re-tokenize; " +
        "at 100 TB the operator rides the scan. Chunk identity " +
        "travels as md5 so downstream exact-dedup of chunks is a " +
        "16-byte groupBy (q19 one level down); the oracle re-derives " +
        "every chunk boundary and hash with DuckDB list slicing.",
      (spark, dir) => {
        CorpusOps.chunkTokens(
            Tables.table(spark, dir, "documents"), "doc_id", "text",
            window = 64, stride = 40)
          .drop("chunk_text")
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(raw"""
        WITH D AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        C AS (SELECT doc_id, i AS chunk_idx,
                     toks[i*40+1 : least(i*40+64, len(toks))] AS chunk
              FROM D, LATERAL (SELECT unnest(range(0, ((len(toks)-1)//40)+1)) AS i))
        SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(len(chunk) AS BIGINT) AS n_tokens,
               md5(array_to_string(chunk, ' ')) AS chunk_md5
        FROM C ORDER BY doc_id, chunk_idx""")),

    GraftQuery(
      "q154_pmi_pairs",
      "Token co-occurrence PMI (CorpusOps.pmiPairs) — collocation " +
        "mining ranked by the EXACT scaled rational cxy*N*1e6/" +
        "(df_a*df_b) (monotone in PMI, pure BIGINT: no log, no float " +
        "lottery). The vocab^2 explosion is triple-bounded and every " +
        "bound is scale-RELATIVE so it binds identically at any sf: " +
        "df band 2 <= df <= 0.8*N (drops ubiquitous boilerplate " +
        "tokens), per-doc pair fan-out rides the BANDED per-doc " +
        "vocab, and pairs must co-occur in >= 5% of documents. Two " +
        "shuffles + a broadcast vocabulary.",
      (spark, dir) =>
        CorpusOps.pmiPairs(
          Tables.table(spark, dir, "documents"), "doc_id", "text", topK = 100),
      Some(raw"""
        WITH T AS (SELECT DISTINCT doc_id,
                          unnest(string_split_regex(trim(text), '\s+')) AS t
                   FROM documents),
        N AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        DF AS (SELECT t, count(*) AS df FROM T GROUP BY t),
        V AS (SELECT t, df, n FROM DF, N WHERE df >= 2 AND df * 10 <= n * 8),
        TD AS (SELECT t.doc_id, t.t, v.df, v.n FROM T t JOIN V v USING (t)),
        PAIR AS (SELECT a.t AS ta, b.t AS tb, a.df AS dfa, b.df AS dfb,
                        a.n AS n, count(*) AS cxy
                 FROM TD a JOIN TD b ON a.doc_id = b.doc_id AND a.t < b.t
                 GROUP BY 1, 2, 3, 4, 5)
        SELECT ta, tb, CAST(cxy AS BIGINT) AS n_both,
               CAST(dfa AS BIGINT) AS df_a, CAST(dfb AS BIGINT) AS df_b,
               CAST((cxy * n * 1000000) // (dfa * dfb) AS BIGINT) AS pmi_scaled
        FROM PAIR WHERE cxy * 20 >= n
        ORDER BY pmi_scaled DESC, ta, tb LIMIT 100""")),

    GraftQuery(
      "q155_bigram_surprisal",
      "Bigram-LM fluency surprisal (CorpusOps.bigramSurprisal) — the " +
        "conditional-probability upgrade of q113: first token pays " +
        "its unigram bits, every following position pays " +
        "floor(log2(c(v.)/c(v,w))) under the corpus' own bigram " +
        "distribution. Word-order scrambles that unigram surprisal " +
        "cannot see score high here — the actual fluency signal. " +
        "Same integer-exact length(bin(a div b))-1 mechanics as " +
        "q113/q117 (no transcendentals, bit-portable); bigrams form " +
        "per-row via zip_with of the token array and its shift (no " +
        "positional self-join), both bits tables freeze driver-side " +
        "(bigram-vocabulary-bounded) and broadcast — train once, " +
        "score in one pass.",
      (spark, dir) =>
        CorpusOps.bigramSurprisal(
            Tables.table(spark, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(raw"""
        WITH D AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        BG AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                                    i -> toks[i] || ' ' || toks[i+1])) AS bg
               FROM D),
        BTF AS (SELECT doc_id, bg, count(*) AS tf FROM BG GROUP BY doc_id, bg),
        CVW AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS cvw FROM BTF GROUP BY bg),
        CV AS (SELECT split_part(bg, ' ', 1) AS v, CAST(sum(cvw) AS BIGINT) AS cv
               FROM CVW GROUP BY 1),
        BBITS AS (SELECT bg, CAST(length(bin(cv // cvw)) - 1 AS BIGINT) AS bits
                  FROM CVW JOIN CV ON split_part(bg, ' ', 1) = v),
        T AS (SELECT doc_id, unnest(toks) AS term FROM D),
        TF AS (SELECT doc_id, term, count(*) AS tf FROM T GROUP BY 1, 2),
        C AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM TF GROUP BY term),
        N AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM C),
        UB AS (SELECT term, CAST(length(bin(n // c)) - 1 AS BIGINT) AS ubits
               FROM C, N),
        BI AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS big_bits
               FROM BTF JOIN BBITS USING (bg) GROUP BY doc_id),
        F AS (SELECT doc_id, len(toks) AS n_tokens, toks[1] AS w1 FROM D)
        SELECT f.doc_id, CAST(f.n_tokens AS BIGINT) AS n_tokens,
               CAST(ub.ubits + coalesce(bi.big_bits, 0) AS BIGINT) AS info_bits,
               CAST(ub.ubits + coalesce(bi.big_bits, 0) AS DOUBLE) / f.n_tokens
                 AS mean_bits
        FROM F f JOIN UB ub ON ub.term = f.w1
        LEFT JOIN BI bi ON bi.doc_id = f.doc_id
        ORDER BY f.doc_id""")),

    GraftQuery(
      "q168_chunk_dedup",
      "Chunk-level incremental exact dedup — q150's chunking composed " +
        "with q49's production dedup flow, one level below documents " +
        "(where near-identical docs still share most passages): the " +
        "even-doc chunk batch dedupes against an empty index " +
        "(min-chunk-id canonical per canonical fingerprint), its " +
        "SURVIVORS' fingerprints become the index, and the odd-doc " +
        "batch dedupes against that — cross-batch duplicate chunks " +
        "dropped forever, the anti-join shuffling 16-byte " +
        "fingerprints only. The oracle re-derives every boundary, " +
        "hash, and the two-stage survivor rule (earliest even chunk " +
        "if any, else earliest odd).",
      (spark, dir) => {
        val spark0 = spark
        import spark0.implicits._
        val chunks = CorpusOps.chunkTokens(
            Tables.table(spark, dir, "documents"), "doc_id", "text",
            window = 64, stride = 40)
          .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
            col("doc_id"), col("chunk_idx"), col("chunk_md5"), col("chunk_text"))
        val evens = chunks.filter(col("doc_id") % 2 === 0)
        val odds = chunks.filter(col("doc_id") % 2 === 1)
        val s0 = Dedup.dedupAgainstIndex(
          evens, Seq.empty[String].toDF("fp"), "chunk_id", "chunk_text")
        val index = s0.select(
          graft.functions.TextFunctions.fingerprint(col("chunk_text")).as("fp"))
        val s1 = Dedup.dedupAgainstIndex(odds, index, "chunk_id", "chunk_text")
        s0.unionByName(s1)
          .select(col("chunk_id"), col("doc_id"),
            col("chunk_idx"), col("chunk_md5"))
          .orderBy(col("chunk_id"))
      },
      Some(raw"""
        WITH D AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        C AS (SELECT doc_id, i AS chunk_idx, doc_id * 1000 + i AS cid,
                     doc_id % 2 AS par,
                     array_to_string(toks[i*40+1 : least(i*40+64, len(toks))],
                                     ' ') AS ct
              FROM D, LATERAL (SELECT unnest(range(0, ((len(toks)-1)//40)+1)) AS i)),
        F AS (SELECT doc_id, chunk_idx, cid, par, md5(ct) AS h,
                     md5(lower(regexp_replace(ct, '\s+', ' ', 'g'))) AS fp
              FROM C),
        S AS (SELECT fp, coalesce(min(cid) FILTER (par = 0), min(cid)) AS keep
              FROM F GROUP BY fp)
        SELECT f.cid AS chunk_id, f.doc_id, CAST(f.chunk_idx AS INT) AS chunk_idx,
               f.h AS chunk_md5
        FROM F f JOIN S s ON s.fp = f.fp AND s.keep = f.cid
        ORDER BY chunk_id""")),

    GraftQuery(
      "q169_equidepth_bins",
      "Equi-depth (decile) length binning — the curriculum/batching " +
        "prerequisite (length-bucketed batches waste no padding; " +
        "difficulty schedules bin by length): bin boundaries are " +
        "EXACT ORDER STATISTICS, b_k = the smallest length whose " +
        "cumulative count reaches ceil(k*N/10), derived from a " +
        "driver-side (length, count) histogram exactly as q118's " +
        "exact side (bounded by the distinct-length domain, never a " +
        "sort of N rows) — all integers, so bin assignment " +
        "(count of boundaries strictly below) is engine-exact with " +
        "no interpolated-percentile float lottery. Assignment is a " +
        "codegen'd 9-comparison fold over the broadcast boundaries.",
      (spark, dir) => {
        val lens = Tables.table(spark, dir, "documents")
          .select(col("doc_id"),
            size(graft.functions.TextFunctions.words(col("text"))).as("n"))
        val hist = lens.groupBy(col("n")).agg(count(lit(1)).as("c"))
          .orderBy(col("n")).collect()
        val total = hist.map(_.getLong(1)).sum
        val cum = hist.scanLeft(0L)((acc, r) => acc + r.getLong(1)).tail
        val bounds = (1 to 9).map { k =>
          val need = (k * total + 9) / 10
          hist(cum.indexWhere(_ >= need)).getInt(0)
        }
        val bin = bounds.foldLeft(lit(0)) { (acc, b) =>
          acc + when(col("n") > b, 1).otherwise(0)
        }
        lens.withColumn("bin", bin)
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n")).cast("long").as("min_len"),
            max(col("n")).cast("long").as("max_len"),
            sum(col("n")).as("token_sum"))
          .orderBy(col("bin"))
      },
      Some(raw"""
        WITH L AS (SELECT doc_id,
                          len(string_split_regex(trim(text), '\s+')) AS n
                   FROM documents),
        HH AS (SELECT n AS v, count(*) AS c FROM L GROUP BY n),
        CUM AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM HH),
        NN AS (SELECT count(*) AS total FROM L),
        B AS (SELECT k, (SELECT min(v) FROM CUM, NN
                         WHERE cum >= (k * total + 9) // 10) AS b
              FROM (SELECT unnest(range(1, 10)) AS k)),
        A AS (SELECT l.doc_id, l.n,
                     (SELECT count(*) FROM B WHERE l.n > B.b) AS bin
              FROM L l)
        SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(n) AS BIGINT) AS min_len,
               CAST(max(n) AS BIGINT) AS max_len,
               CAST(sum(n) AS BIGINT) AS token_sum
        FROM A GROUP BY bin ORDER BY bin""")),

    GraftQuery(
      "q248_phrase_search",
      "Phrase + proximity search from POSITIONAL postings — documents " +
        "where 'hash' follows 'table' within 3 positions: phrase_tf " +
        "counts exact adjacency (the quoted-phrase \"table hash\" hit " +
        "count), near_tf all in-window pairs (the slop relaxation a " +
        "retrieval stack serves as 'A near B'). The (doc_id, pos, " +
        "term) postings are the stored row format (q102's postings " +
        "plus position); both term branches filter BEFORE the join, " +
        "so at 100 TB this is two selective posting-list lookups " +
        "merged on doc_id with the position window as residual — " +
        "never an all-positions self-join. Integer positions and " +
        "counts; (phrase_tf, near_tf, doc_id) totals the order.",
      (spark, dir) => {
        import graft.corpus.TextRetrieval
        val d = Tables.table(spark, dir, "documents")
        TextRetrieval.phraseFromPostings(
          TextRetrieval.positionalPostings(d, "doc_id", "text"),
          first = "table", second = "hash", slop = 3)
      },
      Some(raw"""
        WITH W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                   FROM documents),
        T AS (SELECT doc_id, t.pos AS pos, w[CAST(t.pos AS INTEGER)] AS term
              FROM W, unnest(range(1, len(w)+1)) AS t(pos)),
        A AS (SELECT doc_id, pos AS pa FROM T WHERE term = 'table'),
        B AS (SELECT doc_id, pos AS pb FROM T WHERE term = 'hash'),
        M AS (SELECT a.doc_id,
                     CAST(SUM(CASE WHEN b.pb = a.pa + 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS phrase_tf,
                     count(*) AS near_tf
              FROM A a JOIN B b ON a.doc_id = b.doc_id
              WHERE b.pb BETWEEN a.pa + 1 AND a.pa + 3
              GROUP BY a.doc_id)
        SELECT doc_id, phrase_tf, near_tf FROM M
        ORDER BY phrase_tf DESC, near_tf DESC, doc_id"""))
  )
}
