package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Sampling, TrainingDataPipeline}

/** End-to-end verification of the composed LLM-training-data cleaning
  * pipeline: exact dedup -> LSH-candidates+Jaccard-verify near-dedup ->
  * language filter -> quality threshold, all stages chained exactly as
  * [[TrainingDataPipeline.clean]] wires them. The oracle rebuilds every
  * stage in SQL from the already-verified per-stage oracles (q19, q43,
  * q17, q18), applied to each stage's survivor set in sequence.
  *
  * The 0.5 quality cut is safe to compare exactly: q18 proves the
  * quality doubles are bit-identical between engines (same expression
  * tree, explicit double casts), so the threshold decides identically
  * even for a document landing exactly on 0.5.
  */
object PipelineQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q45_training_clean",
      "Composed cleaning pipeline survivors: exact dedup -> LSH+Jaccard " +
        "near-dedup -> lang filter (en) -> quality >= 0.5.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        // persistStages deliberately left false here: the cached stage
        // blocks would outlive this query (nothing unpersists inside a
        // Verify/Bench run) and the bench's min-of-2 would report the
        // cached-read time instead of the pipeline's real cost
        TrainingDataPipeline.clean(d, "doc_id", "text",
            keepLangs = Seq("en"), minQuality = 0.5)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH FP AS (
          SELECT doc_id, text, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
          FROM documents),
        D1 AS (
          SELECT doc_id, text FROM FP
          QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)),
        W AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM D1),
        S AS (SELECT DISTINCT doc_id,
                     unnest([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
              FROM W),
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
              FROM C c JOIN S x ON x.doc_id = c.id_a
              JOIN S y ON y.doc_id = c.id_b AND y.g = x.g
              GROUP BY 1, 2),
        V AS (SELECT DISTINCT P.id_b FROM P
              JOIN N na ON P.id_a = na.doc_id JOIN N nb ON P.id_b = nb.doc_id
              WHERE common * 2 >= (na.n + nb.n - common) * 1),
        D2 AS (SELECT doc_id, text FROM D1 WHERE doc_id NOT IN (SELECT id_b FROM V)),
        LW AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM D2),
        LS AS (
          SELECT doc_id, text,
                 len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and')) + len(list_filter(w, x -> x = 'of')) AS en,
                 len(list_filter(w, x -> x = 'der')) + len(list_filter(w, x -> x = 'die')) + len(list_filter(w, x -> x = 'und')) AS de,
                 len(list_filter(w, x -> x = 'le')) + len(list_filter(w, x -> x = 'la')) + len(list_filter(w, x -> x = 'et')) AS fr,
                 len(list_filter(w, x -> x = 'el')) + len(list_filter(w, x -> x = 'los')) + len(list_filter(w, x -> x = 'y')) AS es
          FROM LW),
        D3 AS (
          SELECT doc_id, text FROM LS
          WHERE greatest(en, de, fr, es) > 0 AND en = greatest(en, de, fr, es)),
        QW AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM D3),
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
        SELECT doc_id FROM Q WHERE quality >= 0.5 ORDER BY doc_id""")),

    GraftQuery(
      "q47_deterministic_split",
      "Content-stable train/test split: assignment follows from the id's " +
        "md5 prefix alone (rerun-, partition- and engine-invariant), " +
        "unlike seed+partitioning-dependent randomSplit.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Sampling.withSplit(d, "doc_id", testFrac = 0.2)
          .select(col("doc_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'
                    THEN 'test' ELSE 'train' END AS split
        FROM documents ORDER BY doc_id""")),

    GraftQuery(
      "q48_token_packing",
      "Sharded concat-and-chunk packing: md5-sharded streams, per-shard " +
        "running token sum, bin = start-offset / budget. Deterministic " +
        "and parallel (one window per shard) — never a global cumsum.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast("long").as("n_tokens"))
        Sampling.packIntoBins(d, "doc_id", "n_tokens",
            binSize = 2048L, nShards = 8)
          .select(col("doc_id"), col("shard"), col("bin"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH T AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                 CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
          FROM documents),
        C AS (
          SELECT doc_id, n_tokens, shard,
                 SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM T)
        SELECT doc_id, shard, CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS bin
        FROM C ORDER BY doc_id""")),

    GraftQuery(
      "q50_weighted_mixing",
      "Deterministic weighted corpus mixing: en docs at rate 0.8, others " +
        "at 0.25, each source a stable md5 slice of its keyspace — the " +
        "rerunnable, RNG-free way training mixtures are drawn.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Sampling.mixSources(Seq(
            ("high", d.filter(col("lang") === "en"), 0.8),
            ("low", d.filter(col("lang") =!= "en"), 0.25)), "doc_id")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, 'high' AS source FROM documents
        WHERE lang = 'en'
          AND substr(md5('mix:high:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
        UNION ALL
        SELECT doc_id, 'low' AS source FROM documents
        WHERE lang <> 'en'
          AND substr(md5('mix:low:' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
        ORDER BY doc_id""")),

    GraftQuery(
      "q69_stratified_sample",
      "Stratified rebalancing sample by language: en kept at 0.25, fr " +
        "at 0.5, de whole, everything else at the 0.1 default — each " +
        "stratum its own independent md5 slice, the distribution-" +
        "reshaping step of corpus assembly. Pure per-row predicate, no " +
        "RNG, partition-invariant.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Sampling.stratifiedSample(d, "doc_id", "lang",
            Map("en" -> 0.25, "de" -> 1.0, "fr" -> 0.5), defaultRate = 0.1)
          .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, lang FROM documents
        WHERE CASE lang
                WHEN 'de' THEN TRUE
                WHEN 'en' THEN substr(md5('strata:' || lang || ':' ||
                  CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
                WHEN 'fr' THEN substr(md5('strata:' || lang || ':' ||
                  CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
                ELSE substr(md5('strata:' || lang || ':' ||
                  CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
              END
        ORDER BY doc_id""")),

    GraftQuery(
      "q84_uniform_sample",
      "Deterministic uniform 30-per-source sample: rank by salted md5 " +
        "of the doc id (a reproducible permutation) and keep the first " +
        "30 per source — the reservoir-sampling replacement with no RNG " +
        "state, stable under reruns and repartitioning.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Sampling.uniformPerGroup(d, "source", "doc_id", k = 30)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, source FROM documents
        QUALIFY row_number() OVER (PARTITION BY source
          ORDER BY md5('sample' || ':' || CAST(doc_id AS VARCHAR)), doc_id) <= 30
        ORDER BY doc_id""")),

    GraftQuery(
      "q96_token_budget_sample",
      "Deterministic per-source TOKEN-budget sample (pretraining mixes " +
        "are specified in tokens, not doc counts — q84 caps docs, this " +
        "caps tokens): salted-md5 permutation per source, keep docs " +
        "whose preceding cumulative tokens are under 2000, so each " +
        "source lands within one doc of its budget. One bounded window " +
        "per source, never a global cumsum; q16's token-count parity.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Sampling.sampleToTokenBudget(d, "doc_id", "text", "source",
            budgetTokens = 2000L)
          .select(col("doc_id"), col("source"), col("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH T AS (
          SELECT doc_id, source,
                 CAST(coalesce(len(string_split_regex(trim(text), '\s+')), 0) AS BIGINT) AS n_tokens
          FROM documents),
        C AS (
          SELECT doc_id, source, n_tokens,
                 coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5('budget' || ':' || CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM T)
        SELECT doc_id, source, n_tokens FROM C
        WHERE cum_before < 2000
        ORDER BY doc_id""")),

    GraftQuery(
      "q85_dup_size_histogram",
      "Exact-duplicate group-size histogram: how many contents exist in " +
        "1, 2, ... copies — the other monitoring view of dedup pressure " +
        "(q80 is per-source, this is per-multiplicity). Two hash aggs " +
        "on the 16-byte fingerprint; no text shuffled.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        graft.dedup.Dedup.exactGroups(d, "doc_id", "text")
          .groupBy(col("n_copies"))
          .agg(count(lit(1)).as("n_groups"))
          .orderBy(col("n_copies"))
      },
      Some(raw"""
        WITH G AS (
          SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
                 count(*) AS n_copies
          FROM documents GROUP BY fp)
        SELECT n_copies, CAST(count(*) AS BIGINT) AS n_groups
        FROM G GROUP BY n_copies
        ORDER BY n_copies""")),

    GraftQuery(
      "q135_curriculum_schedule",
      "Sharded curriculum schedule (easy-first training order): q18's " +
        "quality score orders each md5 shard's documents cleanest-" +
        "first, ntile cuts each shard into 4 contiguous difficulty " +
        "stages, and positions number within (shard, stage) — the " +
        "exact shape data-loader workers consume (per-shard order, " +
        "never a global sort: every window partitions by shard, so " +
        "the schedule parallelizes where a global ORDER BY would " +
        "funnel the corpus through one task). Deterministic: md5 " +
        "shard, (quality desc, id) order, ANSI ntile on both engines.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val q = graft.functions.TextAnalysis.qualityByDoc(d, "doc_id", "text")
        Sampling.curriculumSchedule(q, "doc_id", "quality",
            nStages = 4, nShards = 8)
          .select(col("doc_id"), col("shard"), col("stage"), col("pos"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH QW AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
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
          FROM QS),
        T AS (
          SELECT doc_id, quality,
                 CAST(('0x' || substr(md5('curr:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
          FROM Q),
        N AS (
          SELECT doc_id, shard,
                 ntile(4) OVER (PARTITION BY shard ORDER BY quality DESC, doc_id) AS stage
          FROM T)
        SELECT doc_id, shard, CAST(stage AS BIGINT) AS stage,
               CAST(row_number() OVER (PARTITION BY shard, stage ORDER BY doc_id) AS BIGINT) AS pos
        FROM N ORDER BY doc_id""")),

    GraftQuery(
      "q136_temperature_quotas",
      "Temperature-flattened source mixing (the multilingual/multi-" +
        "source sampling recipe: rates proportional to n^(1/T), T=2 " +
        "via sqrt — flattens head sources, boosts the tail): each " +
        "source's quota out of a 1000-doc budget is computed RELATIVE " +
        "TO THE LARGEST source, deliberately avoiding a normalizing " +
        "fp SUM whose summation order varies by engine — sqrt and one " +
        "division are correctly-rounded IEEE ops, bit-identical in " +
        "Spark and DuckDB, so the floor is hash-exact. One groupBy " +
        "over the corpus; everything downstream runs on |sources| rows.",
      (spark, dir) =>
        Sampling.temperatureQuotas(
            Tables.table(spark, dir, "documents"), "source", budget = 1000L)
          .orderBy(col("source")),
      Some("""
        WITH C AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                   FROM documents GROUP BY source),
        M AS (SELECT max(n_docs) AS mx FROM C)
        SELECT source, n_docs,
               CAST(FLOOR((CAST(1000 AS DOUBLE) * sqrt(CAST(n_docs AS DOUBLE)))
                          / sqrt(CAST(mx AS DOUBLE))) AS BIGINT) AS quota
        FROM C, M ORDER BY source""")),

    GraftQuery(
      "q193_global_shuffle",
      "Fixed-seed GLOBAL shuffle order for reproducible training " +
        "(every doc gets its exact position in one epoch's data " +
        "order): the deterministic md5 permutation every selection " +
        "here uses (salted per epoch, so epochs are independent " +
        "shuffles), positioned by SortedNeighborhood.globalRank — " +
        "range-partitioned + offset-composed, never a single-" +
        "partition window, and rerun/partitioning-invariant where " +
        "Spark's rand(seed) is neither (seed + partition layout " +
        "change the draw). The position column is what a curriculum " +
        "or resumable dataloader keys on: shard = pos mod workers, " +
        "resume = pos > checkpoint.",
      (spark, dir) => {
        import graft.operators.SortedNeighborhood
        val d = Tables.table(spark, dir, "documents")
          .select(col("doc_id"),
            md5(concat_ws(":", lit("shuffle-epoch-0"),
              col("doc_id").cast("string"))).as("h"))
        SortedNeighborhood.globalRank(d, Seq(col("h"), col("doc_id")), "pos")
          .select(col("doc_id"), col("pos"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH H AS (SELECT doc_id,
                          md5('shuffle-epoch-0:' || CAST(doc_id AS VARCHAR)) AS h
                   FROM documents)
        SELECT doc_id, CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM H ORDER BY doc_id""")),

    GraftQuery(
      "q200_curation_funnel",
      "The curation FUNNEL census — per-stage survivor counts through " +
        "a composed cleaning pass, the report every 100 TB pipeline " +
        "run ends with (what did each stage cost us?): input (the " +
        "corpus plus a synthesized duplicate slice under fresh ids — " +
        "the fixture has no organic dups), NFC-canonical exact dedup " +
        "(fingerprint = md5 of the q192-normalized lowercased text, " +
        "min-id keeper), language whitelist, length band, and the " +
        "q47 content-stable train split. Every stage is a predicate " +
        "or one grouped keeper join — the funnel itself adds five " +
        "scalar aggregates over progressively smaller frames. A " +
        "stage silently dropping or double-keeping rows lands as a " +
        "wrong census cell, named by stage.",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.UnicodeExpressions.nfcCol
        val d = Tables.table(spark, dir, "documents")
        val extra = d.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        val input = d.unionByName(extra)
        // every stage as a FLAG on one frame, census as ONE aggregation
        // pass (a count() per stage would re-run the union + hashing +
        // dedup lineage up to five times); the keeper flag is a window
        // min over the fingerprint — one shuffle, no join-back
        val flagged = input
          .withColumn("fp", md5(nfcCol(lower(trim(col("text"))))))
          .withColumn("keeper", col("doc_id") ===
            min(col("doc_id")).over(Window.partitionBy(col("fp"))))
          .withColumn("lang_ok", col("lang").isin("en", "de", "fr", "es"))
          .withColumn("len_ok", col("n_chars").between(100, 500))
          .withColumn("train_ok",
            substring(md5(concat(lit("split:"), col("doc_id").cast("string"))),
              1, 8) >= "33333333")
        val c = flagged.agg(
          count(lit(1)).as("s0"),
          sum(when(col("keeper"), 1L).otherwise(0L)).as("s1"),
          sum(when(col("keeper") && col("lang_ok"), 1L).otherwise(0L)).as("s2"),
          sum(when(col("keeper") && col("lang_ok") && col("len_ok"), 1L)
            .otherwise(0L)).as("s3"),
          sum(when(col("keeper") && col("lang_ok") && col("len_ok") &&
            col("train_ok"), 1L).otherwise(0L)).as("s4"))
          .collect()(0)
        import spark.implicits._
        Seq(
          ("s0_input", c.getLong(0)), ("s1_nfc_dedup", c.getLong(1)),
          ("s2_lang", c.getLong(2)), ("s3_length", c.getLong(3)),
          ("s4_train", c.getLong(4)))
          .toDF("stage", "n_rows")
          .orderBy(col("stage"))
      },
      Some("""
        WITH INPUT AS (
          SELECT doc_id, text, lang, n_chars FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text, lang, n_chars FROM documents
          WHERE doc_id % 5 = 0),
        FP AS (SELECT doc_id, lang, n_chars,
                      md5(nfc_normalize(lower(trim(text)))) AS fp
               FROM INPUT),
        K AS (SELECT fp, min(doc_id) AS doc_id FROM FP GROUP BY fp),
        S1 AS (SELECT f.* FROM FP f
               JOIN K ON K.fp = f.fp AND K.doc_id = f.doc_id),
        S2 AS (SELECT * FROM S1 WHERE lang IN ('en', 'de', 'fr', 'es')),
        S3 AS (SELECT * FROM S2 WHERE n_chars BETWEEN 100 AND 500),
        S4 AS (SELECT * FROM S3
               WHERE substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     >= '33333333')
        SELECT 's0_input' AS stage, count(*) AS n_rows FROM INPUT
        UNION ALL SELECT 's1_nfc_dedup', count(*) FROM S1
        UNION ALL SELECT 's2_lang', count(*) FROM S2
        UNION ALL SELECT 's3_length', count(*) FROM S3
        UNION ALL SELECT 's4_train', count(*) FROM S4
        ORDER BY stage"""))
  )
}
