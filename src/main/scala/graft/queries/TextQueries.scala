package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.dedup.Dedup

/** Text-analysis operators over the `documents` table (SURVEY.md §2.10):
  * token stats, language-ID, quality scoring, fingerprint dedup. Every
  * oracle mirrors the Spark expression tree exactly (same operation
  * order, explicit double casts) so values are bit-identical.
  */
object TextQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q16_text_stats",
      "Token counting + character-class stats, pure codegen'd expressions.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        d.select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          // BPE-ish segmentation: letter runs / digit runs / single marks
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("bpeish_tokens"),
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("n_alpha"),
          (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
            / length(col("text")).cast("double")).as("alpha_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpeish_tokens,
               CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
               CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE) AS alpha_ratio
        FROM documents ORDER BY doc_id""")),

    GraftQuery(
      "q17_lang_id",
      "Marker-word language-ID heuristic (n-gram/stopword scoring, argmax).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        // aggregate formulation (tokenize once, codegen'd hash agg);
        // same semantics as TextFunctions.langId, ~20x faster at scale
        graft.functions.TextAnalysis.langIdByDoc(d, "doc_id", "text", carry = Seq("lang"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH W AS (
          SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w FROM documents),
        S AS (
          SELECT doc_id, lang,
                 len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'and')) + len(list_filter(w, x -> x = 'of')) AS en,
                 len(list_filter(w, x -> x = 'der')) + len(list_filter(w, x -> x = 'die')) + len(list_filter(w, x -> x = 'und')) AS de,
                 len(list_filter(w, x -> x = 'le')) + len(list_filter(w, x -> x = 'la')) + len(list_filter(w, x -> x = 'et')) AS fr,
                 len(list_filter(w, x -> x = 'el')) + len(list_filter(w, x -> x = 'los')) + len(list_filter(w, x -> x = 'y')) AS es
          FROM W)
        SELECT doc_id, lang,
               CASE WHEN greatest(en, de, fr, es) <= 0 THEN 'und'
                    WHEN en = greatest(en, de, fr, es) THEN 'en'
                    WHEN de = greatest(en, de, fr, es) THEN 'de'
                    WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM S ORDER BY doc_id""")),

    GraftQuery(
      "q18_quality_score",
      "Per-document quality score: length/alpha-density/stopword-density mix.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        // aggregate formulation of TextFunctions.qualityScore (identical
        // values, one narrow shuffle instead of interpreted array HOFs)
        graft.functions.TextAnalysis.qualityByDoc(d, "doc_id", "text")
          .orderBy(col("doc_id"))
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
          FROM W)
        SELECT doc_id,
               CAST(0.4 AS DOUBLE) * least(n_tokens / CAST(64.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
               + CAST(0.3 AS DOUBLE) * (n_alpha / n_chars)
               + CAST(0.3 AS DOUBLE) * least(stop_hits * CAST(8.0 AS DOUBLE) / n_tokens, CAST(1.0 AS DOUBLE)) AS quality
        FROM S ORDER BY doc_id""")),

    GraftQuery(
      "q19_dedup_exact",
      "Exact dedup on canonical-form fingerprint (16-byte shuffle key).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        Dedup.exactGroups(d, "doc_id", "text").orderBy(col("fp"))
      },
      Some(raw"""
        SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY fp""")),

    GraftQuery(
      "q28_rolling_hash",
      "64-bit polynomial rolling-hash fingerprint (custom codegen'd " +
        "Expression). Oracle emulates the wrapping long arithmetic in " +
        "DuckDB HUGEINT mod 2^64, re-signing at the end; byte-exact " +
        "because the documents fixture is pure non-empty ASCII (verified " +
        "at every SF), so per-char code points ARE the UTF-8 bytes.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        d.select(col("doc_id"),
            graft.functions.RollingHash.rollingHash(col("text")).as("rhash"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                         THEN h - 18446744073709551616::HUGEINT
                         ELSE h END AS BIGINT) AS rhash
        FROM (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(0::HUGEINT,
                     list_transform(string_split(text, ''), x -> ord(x)::HUGEINT)),
                   (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS h
          FROM documents)
        ORDER BY doc_id""")),

    GraftQuery(
      "q60_token_budget",
      "Token budgeting: whitespace vs BPE-style pre-tokenizer counts " +
        "(letter/digit/punct runs via codegen'd regexp_extract_all) plus " +
        "chars-per-token — the per-doc numbers a packing/costing pass " +
        "budgets with.",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        d.select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast("long").as("n_tokens"),
            graft.functions.TextFunctions.bpeishTokenCount(col("text"))
              .cast("long").as("n_bpeish"),
            // nullif guard: an empty/whitespace-only doc has 0 pre-tokens;
            // Spark's non-ANSI divide would return NULL but DuckDB IEEE
            // division returns inf — make NULL the explicit contract on
            // both sides rather than fixture-dependent
            (length(col("text")).cast("double") /
              nullif(graft.functions.TextFunctions.bpeishTokenCount(col("text")),
                lit(0)))
              .as("chars_per_token"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\f\r]+')) AS BIGINT) AS n_bpeish,
               CAST(length(text) AS DOUBLE) /
                 nullif(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\f\r]+')), 0) AS chars_per_token
        FROM documents ORDER BY doc_id""")),

    GraftQuery(
      "q68_pii_redaction",
      "PII scrub: emails, phone numbers and IPv4 addresses replaced " +
        "with typed tags + per-class match counts (audit trail). The " +
        "fixture text carries no PII, so a deterministic contact block " +
        "is derived from each row's columns first; regexes are " +
        "engine-agnostic character classes (no \\b/\\w/lookaround).",
      (spark, dir) => {
        val d = Tables.table(spark, dir, "documents")
        val pii = concat_ws(" ",
          substring(col("text"), 1, 40),
          concat(lit("user"), col("doc_id").cast("string"),
            lit("@"), col("source"), lit(".net")),
          concat(lit("call 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")),
          concat(lit("ip 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), ((col("doc_id") * 7) % 256).cast("string")))
        d.select(
            (col("doc_id") +: graft.functions.TextFunctions.piiCounts(pii)) :+
              graft.functions.TextFunctions.redactPii(pii).as("redacted"): _*)
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH P AS (
          SELECT doc_id,
                 concat_ws(' ', substr(text, 1, 40),
                   concat('user', CAST(doc_id AS VARCHAR), '@', source, '.net'),
                   concat('call 415-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')),
                   concat('ip 10.', CAST(doc_id % 256 AS VARCHAR), '.0.',
                          CAST((doc_id * 7) % 256 AS VARCHAR))) AS pii
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(pii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(pii, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(pii, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
               regexp_replace(regexp_replace(regexp_replace(pii,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted
        FROM P ORDER BY doc_id""")),

    GraftQuery(
      "q181_sentence_stats",
      "Sentence segmentation + per-document sentence statistics — the " +
        "structural text signal the per-token families (q16/q18) " +
        "cannot see: split on terminal punctuation runs ([.!?]+), " +
        "drop empty fragments, count sentences and track total/max/" +
        "mean sentence length (mean as floored micro-units — " +
        "nonnegative domain, so trunc == floor in both engines). The " +
        "regex is an engine-agnostic character class, the split is " +
        "map-side (rides the scan), and the per-doc aggregation is " +
        "one shuffle on doc_id. Docs whose text holds no non-empty " +
        "fragment vanish identically on both sides.",
      (spark, dir) => {
        val frags = Tables.table(spark, dir, "documents")
          .select(col("doc_id"),
            explode(split(col("text"), "[.!?]+")).as("s"))
          .select(col("doc_id"), length(trim(col("s"))).cast("long").as("l"))
          .filter(col("l") > 0)
        frags.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sent"),
            sum(col("l")).as("sum_len"), max(col("l")).as("max_len"))
          .select(col("doc_id"), col("n_sent"), col("sum_len"), col("max_len"),
            expr("sum_len * 1000000 div n_sent").as("mean_len_micro"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH S AS (SELECT doc_id,
                          length(trim(unnest(string_split_regex(text, '[.!?]+')))) AS l
                   FROM documents),
        F AS (SELECT doc_id, l FROM S WHERE l > 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sent,
               CAST(sum(l) AS BIGINT) AS sum_len,
               CAST(max(l) AS BIGINT) AS max_len,
               CAST((sum(l) * 1000000) // count(*) AS BIGINT) AS mean_len_micro
        FROM F GROUP BY doc_id ORDER BY doc_id""")),

    GraftQuery(
      "q192_unicode_normalize",
      "Unicode normalization through native codegen expressions " +
        "(functions.{NfcNormalize,StripAccents}) — the first cleaning " +
        "step of every LLM text pipeline: the same text arrives both " +
        "precomposed (U+00E9) and decomposed (e + U+0301), and every " +
        "exact-dedup hash and equality join downstream silently " +
        "misses until the corpus is NFC-normalized. The fixture " +
        "cycles decomposed / precomposed / combining-diaeresis / " +
        "plain-ASCII variants per doc (built from the same code " +
        "points on both sides — chr() in DuckDB, Scala escapes " +
        "here); outputs are the NFC form (byte-exact vs DuckDB's " +
        "utf8proc nfc_normalize — both implement UAX#15), the " +
        "lower+strip_accents search-fold, and a changed flag. " +
        "ASCII rows take a zero-allocation fast path and never touch " +
        "the JDK Normalizer — at 100 TB the overwhelmingly-ASCII " +
        "corpus pays nothing.",
      (spark, dir) => {
        import graft.functions.UnicodeExpressions.{nfcCol, stripAccentsCol}
        val raw = concat(
          when(col("doc_id") % 4 === 0, lit("cafe\u0301 du parc"))
            .when(col("doc_id") % 4 === 1, lit("caf\u00e9 du parc"))
            .when(col("doc_id") % 4 === 2, lit("Mu\u0308nchen M\u00fcnchen"))
            .otherwise(lit("plain ascii")),
          lit(" #"), col("doc_id").cast("string"))
        Tables.table(spark, dir, "documents")
          .select(col("doc_id"),
            nfcCol(raw).as("nfc"),
            lower(stripAccentsCol(raw)).as("folded"),
            (nfcCol(raw) =!= raw).as("changed"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH R AS (SELECT doc_id,
          CASE WHEN doc_id % 4 = 0 THEN 'cafe' || chr(769) || ' du parc'
               WHEN doc_id % 4 = 1 THEN 'caf' || chr(233) || ' du parc'
               WHEN doc_id % 4 = 2 THEN 'Mu' || chr(776) || 'nchen M' ||
                                        chr(252) || 'nchen'
               ELSE 'plain ascii' END ||
          ' #' || CAST(doc_id AS VARCHAR) AS raw
          FROM documents)
        SELECT doc_id, nfc_normalize(raw) AS nfc,
               lower(strip_accents(raw)) AS folded,
               nfc_normalize(raw) <> raw AS changed
        FROM R ORDER BY doc_id"""))
  )
}
