package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-curation operators (SURVEY.md §2.10 extension): the cleaning
  * steps production LLM-data pipelines run that are NOT per-document —
  * sub-document dedup, benchmark decontamination, repetition-based
  * quality rules, per-source quotas.
  *
  * Scale design (100 TB):
  *  - span dedup shuffles (doc, span) tokens once on the doc id (the
  *    same early-shuffle-before-tokenize move as
  *    [[graft.dedup.Dedup.shingleTable]]) and picks global winners by a
  *    16-byte md5 partition key, never the span text;
  *  - decontamination treats the benchmark side as bounded (benchmark
  *    suites are thousands of documents, not corpora) and broadcasts
  *    its n-gram set — the corpus side is touched exactly once, with
  *    no shuffle at all on the corpus n-grams;
  *  - repetition stats are explode + codegen'd hash-agg per doc (the
  *    corpus-text formulation [[graft.functions.TextAnalysis]] uses,
  *    avoiding interpreted array HOFs), one shuffle keyed on doc id;
  *  - quotas use a per-source window; source cardinality is low, so at
  *    real scale the win is partition pruning AFTER the cap, and for a
  *    pathological single hot source the bounded-heap two-phase shape
  *    of [[graft.functions.TopKAggregator]] is the drop-in replacement.
  */
object CorpusOps {

  /** Exploded span table: the document split into consecutive
    * `spanWords`-word chunks — (id, span_id, span). The sub-document
    * dedup unit (the analog of C4's line-level granularity for fixtures
    * without line structure).
    *
    * Tokens are shuffled to the doc id BEFORE the explode (small
    * parquet fixtures scan as one task; the downstream per-span
    * aggregation needs an exchange anyway, so moving it ahead of the
    * token explosion costs nothing and parallelizes the CPU-heavy
    * split). Span reassembly sorts an at-most-`spanWords`-element
    * struct array per group — the only HOF work is O(spanWords), not
    * O(document). */
  def spanTable(
      df: DataFrame, idCol: String, textCol: String, spanWords: Int = 8): DataFrame = {
    require(spanWords >= 1, "spanWords must be positive")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "w")))
      .withColumn("span_id", floor(col("pos") / spanWords).cast("long"))
      .groupBy(col(idCol), col("span_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("pos"), col("w")))),
          x => x("w")), " ").as("span"))
  }

  /** Sub-document exact dedup across the WHOLE corpus (C4-style line
    * dedup, spans standing in for lines): every span occurring more
    * than once anywhere keeps only its first occurrence by
    * (doc id, span position); documents are reassembled from their
    * surviving spans. Docs whose every span loses vanish entirely.
    *
    * The global winner is chosen by a row_number window over the span's
    * md5 — a single shuffle on a 16-byte key with the span text riding
    * as payload (it is needed for reassembly regardless). A
    * groupBy(min)-then-join formulation would execute the span pipeline
    * twice (Spark shares no non-exchange subplans across join
    * branches). */
  def spanDedup(
      df: DataFrame, idCol: String, textCol: String, spanWords: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("h")).orderBy(col(idCol), col("span_id"))
    spanTable(df, idCol, textCol, spanWords)
      .withColumn("h", md5(col("span").cast("binary")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(sort_array(collect_list(struct(col("span_id"), col("span")))),
            x => x("span")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"))
  }

  /** Benchmark decontamination: drop every corpus document sharing ANY
    * word-`n`-gram with the benchmark set (the standard n-gram-overlap
    * test-set contamination rule; production uses 8-13-grams, tests use
    * 3 to make overlaps reachable at fixture scale).
    *
    * The benchmark n-gram set is broadcast — benchmark suites are
    * bounded (thousands of documents), so the corpus side is read
    * exactly once and its n-grams are never shuffled: the containment
    * probe is a map-side broadcast semi-join, followed by one anti-join
    * on doc ids. Do NOT use this entry point to dedup two corpora
    * against each other — that is [[graft.dedup.Dedup.jaccardOnCandidates]]
    * territory (bucketed, nothing broadcast). */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    val benchGrams = graft.dedup.Dedup
      .shingleTable(benchmark, idCol, textCol, shingleN)
      .select(col("g")).distinct()
    val contaminated = graft.dedup.Dedup
      .shingleTable(corpus, idCol, textCol, shingleN)
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-document benchmark contamination REPORT — the fractional
    * complement of [[decontaminate]]'s binary drop (C4 drops on any
    * overlap; Dolma-style audits want the overlap SHARE to pick a
    * threshold): for every corpus doc with at least one n-gram, its
    * distinct-n-gram count, how many of those hit the benchmark set,
    * and the ratio. Same scale shape as [[decontaminate]] — benchmark
    * grams broadcast, corpus scanned once, one per-doc hash agg with
    * map-side partials; counts are exact integers and the rate is one
    * double division, so every engine agrees bit-for-bit. */
  def contaminationStats(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    val benchGrams = graft.dedup.Dedup
      .shingleTable(benchmark, idCol, textCol, shingleN)
      .select(col("g")).distinct()
    graft.dedup.Dedup.shingleTable(corpus, idCol, textCol, shingleN)
      .join(broadcast(benchGrams.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("contamination_rate",
        expr("CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE)"))
  }

  /** Per-row decontamination: the streaming-capable twin of
    * [[decontaminate]]. Each document is probed against the benchmark
    * n-gram set by the codegen'd
    * [[graft.functions.ShingleOverlapSet]] kernel — tokenize + rolling
    * n-gram + hash probe in one pass, O(words) per row, set built once
    * per JVM (the composable `arrays_overlap`/`shingles` forms are
    * 10-20x slower per row; see the expression's doc). A pure row
    * predicate, so it drops into ANY plan shape including a continuous
    * ingest stream, where the join-based form cannot go (its per-doc
    * shingle aggregation would need watermarked state). Membership is
    * identical to [[decontaminate]] by construction: both test "shares
    * any n-gram with the set".
    *
    * For BOUNDED benchmark suites only (the same boundedness
    * [[decontaminate]]'s broadcast assumes): the gram set ships with
    * the serialized plan, once per executor. */
  def decontaminateRows(
      df: DataFrame, benchGrams: Seq[String],
      textCol: String, shingleN: Int = 3): DataFrame =
    // coalesce: null text -> null predicate; the join-based form KEEPS
    // null-text docs (they produce no shingles, so no contamination
    // evidence) — match that contract
    df.filter(coalesce(
      !graft.functions.ShingleOverlapSet.shingleOverlapSet(
        col(textCol), shingleN, benchGrams),
      lit(true)))

  /** Collect the benchmark's distinct n-grams for
    * [[decontaminateRows]] — the one deliberate driver-side collect in
    * this module, justified by the benchmark-boundedness contract. */
  def benchmarkGrams(
      benchmark: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): Seq[String] =
    graft.dedup.Dedup.shingleTable(benchmark, idCol, textCol, shingleN)
      .select(col("g")).distinct()
      .collect().map(_.getString(0)).toSeq

  /** Repetition-based quality stats per document (Gopher-style rules):
    * fraction of duplicate words, most-frequent-word share, fraction of
    * duplicate word-2-grams, mean word length. All four are ratios of
    * exact integer counts, so any engine computing the same counts gets
    * bit-identical doubles (one IEEE division each) — which is what
    * makes the oracle exact.
    *
    * Plan: ONE token pipeline — a joined words-frame + bigrams-frame
    * formulation would execute the scan/split/explode twice (two join
    * branches of one lineage, the no-subplan-sharing trap). Instead
    * each token row fans out to tagged (kind, term) rows — its word
    * and, via one `lead` window, its bigram — so a single
    * (doc, kind, term) count followed by one conditional doc-level
    * rollup yields every stat. The explicit doc-id repartition is the
    * only exchange: the window and both aggregations reuse it. */
  def repetitionStats(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val word = struct(lit(0).as("kind"), col("w").as("term"))
    val bigram = struct(lit(1).as("kind"),
      concat_ws(" ", col("w"), col("w2")).as("term"))
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "w")))
      .withColumn("w2", lead(col("w"), 1).over(byDoc))
      .select(col(idCol), explode(
        when(col("w2").isNotNull, array(word, bigram))
          .otherwise(array(word))).as("t"))
      .select(col(idCol), col("t.kind").as("kind"), col("t.term").as("term"))
      .groupBy(col(idCol), col("kind"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("kind") === 0, col("c"))).as("n_words"),
        sum(when(col("kind") === 0, 1L)).as("n_distinct"),
        max(when(col("kind") === 0, col("c"))).as("max_word_c"),
        sum(when(col("kind") === 0, length(col("term")) * col("c"))).as("len_sum"),
        sum(when(col("kind") === 1, col("c"))).as("n_2grams"),
        sum(when(col("kind") === 1, 1L)).as("d_2grams"))
      // single-word docs have no bigrams; match the oracle's inner join
      .filter(col("n_2grams").isNotNull)
      .select(col(idCol),
        ((col("n_words") - col("n_distinct")).cast("double") / col("n_words"))
          .as("dup_word_frac"),
        (col("max_word_c").cast("double") / col("n_words")).as("top_word_frac"),
        ((col("n_2grams") - col("d_2grams")).cast("double") / col("n_2grams"))
          .as("dup_2gram_frac"),
        (col("len_sum").cast("double") / col("n_words")).as("mean_word_len"))
  }

  /** The composed corpus-curation pass, wired from the verified pieces
    * (the corpus-level sibling of
    * [[graft.pipeline.TrainingDataPipeline.clean]]'s document-level
    * pipeline):
    *
    *   1. exact dedup on the canonical fingerprint (min-id keeper);
    *   2. benchmark decontamination (broadcast n-gram probe);
    *   3. repetition-rule filter ([[repetitionStats]] thresholds);
    *   4. per-source quota (first-`quotaK` per source).
    *
    * Stage order is deliberate: the cheap hash dedup shrinks the corpus
    * before the n-gram stages, and the quota runs LAST so dropped
    * duplicates/contaminated docs don't consume a source's budget.
    * Every stage is a DataFrame transform keyed on doc ids or 16-byte
    * hashes — the composition scales exactly as its pieces do.
    *
    * The repetition keep-list is computed from the RAW docs, not d2:
    * [[repetitionStats]] is a pure per-document predicate, so the
    * semi-join membership is identical either way, but deriving it
    * from d2 would put the dedup + decontamination lineage in both
    * branches of the semi-join and re-execute it (the same
    * no-subplan-sharing trap [[graft.pipeline.TrainingDataPipeline]]
    * documents for its lang/quality stages). */
  def curate(
      docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, sourceCol: String,
      shingleN: Int = 4,
      maxDupWordFrac: Double = 0.6, maxDup2GramFrac: Double = 0.05,
      quotaK: Int = 10): DataFrame = {
    val drops = graft.pipeline.TrainingDataPipeline.exactDupIds(docs, idCol, textCol)
    val d1 = docs.join(drops, docs(idCol) === drops("id"), "left_anti")
    val d2 = decontaminate(d1, benchmark, idCol, textCol, shingleN)
    val keep = repetitionStats(docs, idCol, textCol)
      .filter(col("dup_word_frac") <= maxDupWordFrac &&
        col("dup_2gram_frac") <= maxDup2GramFrac)
      .select(col(idCol).as("rep_keep_id"))
    val d3 = d2.join(keep, d2(idCol) === col("rep_keep_id"), "left_semi")
    perSourceQuota(d3, sourceCol, idCol, quotaK)
  }

  /** Corpus vocabulary: the top `k` terms by document frequency, with
    * collection frequency riding along (the table tokenizer-training
    * and stopword-derivation passes start from). Deterministic
    * tiebreak on the term itself.
    *
    * Plan: explode + two hash-aggs — (doc, term) dedup-count feeding a
    * term-level rollup — then a `TakeOrderedAndProject` for the top-k
    * (no global sort materialization). The (doc, term) agg reuses the
    * explicit doc-id repartition; only the term rollup reshuffles, and
    * it shuffles one row per distinct (doc, term), never raw tokens. */
  def vocabulary(
      df: DataFrame, idCol: String, textCol: String, k: Int = 100): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)

  /** Boilerplate removal: every span occurring in MORE than
    * `maxDocFreq` distinct documents is dropped from ALL of them (the
    * C4/RefinedWeb frequent-line rule — navigation chrome, cookie
    * banners, license headers). Complementary to [[spanDedup]]: that
    * keeps a duplicated span's first occurrence, this removes
    * high-frequency spans everywhere, and a span repeated only WITHIN
    * one document is untouched (document frequency 1). Documents are
    * reassembled from surviving spans; docs that were pure boilerplate
    * vanish.
    *
    * The document frequency is computed WITHOUT a self-join and without
    * `count(DISTINCT)` (not a window aggregate): `dense_rank` over
    * (span-hash, doc id) reaches the distinct-doc count as its
    * partition max — two window passes over ONE exchange on the 16-byte
    * span hash, the same single-pipeline discipline as [[spanDedup]].
    * A groupBy-df-then-join-back formulation would execute the span
    * pipeline twice (no-subplan-sharing) AND put a hot span's whole
    * row group through one aggregation task. */
  def removeBoilerplate(
      df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 4, maxDocFreq: Int = 2): DataFrame = {
    val byDoc = Window.partitionBy(col("h")).orderBy(col(idCol))
    val whole = Window.partitionBy(col("h"))
    spanTable(df, idCol, textCol, spanWords)
      .withColumn("h", md5(col("span").cast("binary")))
      .withColumn("doc_rank", dense_rank().over(byDoc))
      .withColumn("doc_freq", max(col("doc_rank")).over(whole))
      .filter(col("doc_freq") <= maxDocFreq)
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(sort_array(collect_list(struct(col("span_id"), col("span")))),
            x => x("span")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"))
  }

  /** Corpus-statistics document scoring: each document joined against
    * the corpus-wide token document-frequency table — the feature-build
    * pass behind TF-IDF weighting, stopword discovery and
    * "rare-token-heavy" quality flags. Outputs are exact integers
    * (occurrence counts and df sums), so the oracle is hash-exact with
    * no float analysis.
    *
    * Deliberately TWO passes over the corpus: pass 1 aggregates the
    * bounded df table (vocabulary-sized output, Zipf-shaped), pass 2
    * re-reads the docs and joins each token against it BROADCAST. That
    * is the scale-correct layout — the alternative single-lineage
    * window over the token key would put every occurrence of a hot
    * token ("the", at 100 TB: billions of rows) through one window
    * partition, and sharing the exploded-token frame across both join
    * branches would re-execute it anyway (no subplan sharing). For a
    * vocabulary too large to broadcast, drop the hint: the join keys on
    * the token with AQE skew splitting — same semantics.
    *
    * Output per doc: `n_tokens` (occurrences), `n_distinct`, `df_min` /
    * `df_max` (rarest / commonest token's document frequency), and
    * `df_weight` = sum over occurrences of the token's df (the integer
    * numerator of a mean-commonness score). */
  def tokenFrequencyStats(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    val tokens = df.repartition(n, col(idCol))
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfTab = df.repartition(n, col(idCol))
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(lit(1).as("one"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tokens.join(broadcast(dfTab), Seq("term"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        min(col("df")).as("df_min"),
        max(col("df")).as("df_max"),
        sum(col("tf") * col("df")).as("df_weight"))
  }

  /** Unigram-LM fluency surprisal — the CCNet/Wenzek-style
    * language-model quality filter reduced to its unigram, INTEGER-EXACT
    * form: each token occurrence contributes its Shannon
    * self-information under the corpus' own unigram distribution,
    * floored to whole bits. `bits(term) = floor(log2(N / c(term)))`,
    * computed exactly on integers as `length(bin(N div c)) - 1` (for a
    * real x >= 1, floor(log2 x) equals the bit length of floor(x) minus
    * one) — no transcendental calls, so Spark and any SQL oracle agree
    * bit-for-bit. Common-token text (fluent prose) scores low mean
    * bits; rare-token text (gibberish, boilerplate IDs, wrong-language)
    * scores high — the same ranking CCNet's perplexity buckets induce,
    * quantized.
    *
    * Scale shape: per-doc term counts are one hash agg; the corpus
    * unigram table folds from it (bounded by vocabulary, broadcast
    * back, same posture as [[tokenFrequencyStats]]' df table); N is one
    * exact driver-side scalar like the BM25 N/avgdl pair
    * ([[graft.corpus.TextRetrieval]]). Output per doc: `n_tokens`,
    * `info_bits` (integer sum), `mean_bits` (the one double — a single
    * division of exact integers, IEEE-identical on both sides). */
  def unigramSurprisal(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the bits table is vocabulary-bounded: freeze it driver-side once
    // (one tokenization pass, via unigramBits) and replay it as a
    // broadcast local frame, so the final plan tokenizes the corpus
    // exactly once more — as a lazy lineage the bits subtree would
    // re-run the explode+agg twice inside the final plan
    val bits = unigramBits(df, idCol, textCol)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("term", "bits")
    termTf(df, idCol, textCol)
      .join(broadcast(bits), Seq("term"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("bits")).as("info_bits"))
      .withColumn("mean_bits",
        col("info_bits").cast("double") / col("n_tokens").cast("double"))
  }

  /** Bigram-LM fluency surprisal — the conditional-probability upgrade
    * of [[unigramSurprisal]], same INTEGER-EXACT discipline: a document
    * is charged its first token's unigram self-information plus, for
    * every following position, the conditional bits
    * `floor(log2(c(v·) / c(v,w)))` under the corpus' own bigram
    * distribution (c(v,w) = corpus count of bigram v w; c(v·) = count
    * of bigrams starting with v). Both are `length(bin(a div b)) - 1`
    * — no transcendentals, so any SQL engine agrees bit-for-bit.
    * Word-order scrambles that unigram surprisal cannot see (same
    * token multiset, broken syntax) score high here — the actual
    * fluency signal an LM filter wants.
    *
    * Scale shape: bigrams form per-row with `zip_with` over the token
    * array and its shift (no self-join of positions); per-doc bigram
    * tf is one hash agg; the bigram table is BIGRAM-VOCABULARY-bounded
    * and both bits tables freeze driver-side (the q113 recipe — train
    * the LM once, broadcast, score in one more pass). Scoring corpus
    * shards against a frozen reference table is the deployment shape;
    * scoring the corpus against itself (this form) needs no OOV path
    * by construction. */
  def bigramSurprisal(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toksC = TextFunctions.words(col(textCol))
    val docs = df.where(col(textCol).isNotNull)
      .select(col(idCol), toksC.as("toks"))
    def bgTf(d: DataFrame) = d
      .select(col(idCol), explode(expr(
        "zip_with(slice(toks, 1, size(toks) - 1), " +
          "slice(toks, 2, size(toks) - 1), (a, b) -> concat(a, ' ', b))"))
        .as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("tf"))
    // freeze the (bigram, bits) table driver-side: vocabulary-bounded,
    // and as a lazy lineage the final plan would re-run the full
    // explode+agg chain once per join branch (the q113 rationale)
    val cvw = bgTf(docs).groupBy(col("bg")).agg(sum(col("tf")).as("cvw"))
    val cv = cvw.groupBy(split_part(col("bg"), lit(" "), lit(1)).as("v"))
      .agg(sum(col("cvw")).as("cv"))
    val bbits = cvw
      .join(cv, split_part(col("bg"), lit(" "), lit(1)) === col("v"))
      .select(col("bg"),
        (length(bin(expr("cv div cvw"))) - 1).cast("long").as("bits"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("bg", "bits")
    val ubits = unigramBits(df, idCol, textCol)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("w1", "ubits")
    val bigInfo = bgTf(docs)
      .join(broadcast(bbits), Seq("bg"))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("bits")).as("big_bits"))
    docs
      .select(col(idCol), size(col("toks")).cast("long").as("n_tokens"),
        element_at(col("toks"), 1).as("w1"))
      .join(broadcast(ubits), Seq("w1"))
      .join(bigInfo, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("ubits") + coalesce(col("big_bits"), lit(0L))).as("info_bits"))
      .withColumn("mean_bits",
        col("info_bits").cast("double") / col("n_tokens").cast("double"))
  }

  /** The unigram family's shared per-doc term-frequency pass:
    * (idCol, term, tf) from one explode + hash agg. */
  private def termTf(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(n, col(idCol))
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
  }

  /** The corpus' unigram self-information table — (term, bits) with
    * `bits = floor(log2(N / count))` computed integer-exactly as in
    * [[unigramSurprisal]]. A vocabulary-bounded frame; collect it once
    * to freeze a reference distribution for
    * [[scoreAgainstUnigramBits]] (CCNet's actual deployment shape:
    * the LM is trained on a reference corpus once, then scores every
    * new shard against it). */
  def unigramBits(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = termTf(df, idCol, textCol)
      .groupBy(col("term")).agg(sum(col("tf")).as("c"))
    val totalRow = counts.agg(sum(col("c"))).collect()(0)
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    counts.select(col("term"),
      (length(bin(expr(s"CAST($total AS BIGINT) div c"))) - 1)
        .cast("long").as("bits"))
  }

  /** Row-LOCAL unigram surprisal against a FROZEN bits table — the
    * streaming-capable twin of [[unigramSurprisal]], exactly as
    * [[decontaminateRows]] is to [[decontaminate]]: the (term, bits)
    * map rides the plan as a literal (vocabulary-bounded, the same
    * once-per-plan footprint as the benchmark gram set), and each row
    * folds its own token array through it — no explode, no shuffle, a
    * pure per-row projection that drops into ANY plan shape including
    * a continuous ingest stream, where the join-based form's per-doc
    * aggregation cannot go. All built-in codegen'd higher-order
    * functions (`aggregate` + `element_at`), no UDF. Unknown tokens
    * score `oovBits` (a reference LM must charge unseen words; pick
    * max-corpus-bits + 1 for a CCNet-like penalty). Scoring a corpus
    * against its OWN table is bit-identical to [[unigramSurprisal]]
    * (no OOV by construction — the q113/q117 parity contract). */
  def scoreAgainstUnigramBits(
      df: DataFrame, idCol: String, textCol: String,
      bits: Map[String, Long], oovBits: Long): DataFrame = {
    val lut = typedlit(bits)
    val ws = TextFunctions.words(col(textCol))
    // NULL text drops, matching the join form (whose explode produces
    // no rows for it) — the q113/q117 parity contract covers the
    // whole frame, not just non-null rows
    df.where(col(textCol).isNotNull)
      .select(col(idCol),
        size(ws).cast("long").as("n_tokens"),
        aggregate(ws, lit(0L), (acc, w) =>
          acc + coalesce(element_at(lut, w), lit(oovBits))).as("info_bits"))
      .withColumn("mean_bits",
        col("info_bits").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-source quota: keep at most `k` documents per source, first-k
    * by a deterministic order column (ingest order / doc id). The
    * standard corpus-mixing guard against one domain flooding the mix.
    *
    * A rank window per source is the right default: source cardinality
    * is low and AQE splits skewed partitions. If ONE source is corpus
    * sized and k is small, the bounded-heap two-phase top-k
    * ([[graft.functions.TopKAggregator]]: O(k) state map-side, merge of
    * O(k) heaps) replaces the full sort-within-partition. */
  def perSourceQuota(
      df: DataFrame, sourceCol: String, ordCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(ordCol))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** Per-group top-k THROUGH the bounded-heap aggregator — the
    * hot-group-safe alternative [[perSourceQuota]]'s doc promises:
    * [[graft.functions.TopKAggregator]] keeps O(k) state per group with
    * map-side partial top-k combines, so a corpus-sized group shuffles
    * k candidates per input partition instead of sort-ranking every row
    * in one window partition. Highest score wins, ties to the smaller
    * id — output (group, rank, id), identical to the rank-window
    * formulation (which is exactly what the oracle recomputes). */
  def perSourceTopK(
      df: DataFrame, sourceCol: String, scoreCol: String, idCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(sourceCol).cast("string"), col(scoreCol).cast("double"),
        col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, s, id) => (s, id) }
      .agg(new graft.functions.TopKAggregator(k).toColumn.name("ids"))
      .toDF(sourceCol, "ids")
      .select(col(sourceCol), posexplode(col("ids")).as(Seq("i", idCol)))
      .select(col(sourceCol), (col("i") + 1).cast("long").as("rank"), col(idCol))
  }

  /** Per-document n-gram novelty against everything ingested BEFORE it
    * (doc id = ingestion order): of a doc's distinct shingles, how many
    * first appeared in a lower-id doc. The standard "how much of this
    * batch is new text" signal for dedup-pressure monitoring and
    * crawl-frontier tuning — exact duplicates score 0 novelty, fresh
    * text scores 1.
    *
    * Scale shape: one shuffle keyed on the shingle (the window
    * computing each shingle's first-seen doc), then the per-doc hash
    * agg. Both keys are id-or-hash sized; nothing quadratic, no
    * driver state. Zero-shingle docs (shorter than the window) keep a
    * row via the left join with NULL novelty — explicit, not
    * fixture-dependent (same contract as q60's zero-token guard).
    *
    * Ref semantics: nothing in the reference computes this (its corpus
    * surface stops at per-doc transforms); the operator follows the
    * first-seen convention of [[graft.dedup.Dedup.exactGroups]]'
    * min-id keeper. */
  def noveltyScores(
      df: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    val s = graft.dedup.Dedup.shingleTable(df, idCol, textCol, shingleN)
    val firstSeen = Window.partitionBy(col("g"))
    val agg = s.withColumn("first_doc", min(col(idCol)).over(firstSeen))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") < col(idCol), 1L).otherwise(0L)).as("n_seen"))
    df.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"))
      .withColumn("novelty",
        expr("CAST(1.0 AS DOUBLE) - CAST(n_seen AS DOUBLE) / nullif(CAST(n_shingles AS DOUBLE), CAST(0.0 AS DOUBLE))"))
  }

  /** Per-document out-of-vocabulary rate against the corpus' own top-k
    * vocabulary ([[vocabulary]]) — the tokenizer-health / domain-drift
    * signal: a doc whose tokens mostly miss the head vocabulary is
    * boilerplate, another language, or noise. The vocabulary is a
    * k-row global artifact broadcast into a left join (token side never
    * reshuffles beyond its per-doc agg); token counting reuses the
    * id-partitioned explode discipline of [[vocabulary]]. Zero-token
    * docs keep a row with NULL rate (q60's zero-guard contract). */
  def oovStats(
      df: DataFrame, idCol: String, textCol: String, k: Int = 20): DataFrame = {
    val vocab = vocabulary(df, idCol, textCol, k)
      .select(col("term"), lit(1).as("in_v"))
    val toks = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(graft.functions.TextFunctions.words(col(textCol))).as("term"))
    val agg = toks
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        expr("CAST(n_oov AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), CAST(0.0 AS DOUBLE))"))
  }

  /** Snapshot diff (the CDC / data-versioning primitive): classify
    * every entity across two corpus versions as added / removed /
    * changed / unchanged, comparing content by the canonical
    * fingerprint. One full-outer shuffle join on the entity key with
    * only (key, 16-byte fp) ever shuffled — no text moves, nothing
    * quadratic, so diffing two 100 TB snapshots costs one
    * hash-partitioned pass over each. Keys must be unique within each
    * snapshot (the usual primary-key contract for CDC; duplicate keys
    * would fan out the join). */
  def snapshotDiff(
      oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, textCol: String): DataFrame = {
    val fp = graft.functions.TextFunctions.fingerprint(col(textCol))
    // presence flags, NOT fp-nullness: a NULL text fingerprints to NULL,
    // and inferring absence from it would misclassify such rows (a
    // removed NULL-text entity would read as 'added'). The flags are
    // non-null on exactly the side the key exists on.
    val o = oldSnap.select(col(keyCol).as("k"), fp.as("old_fp"), lit(true).as("in_old"))
    val n = newSnap.select(col(keyCol).as("k"), fp.as("new_fp"), lit(true).as("in_new"))
    o.join(n, Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(col("old_fp") <=> col("new_fp"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Overlapping token-window chunking — the RAG/pretraining passage
    * splitter: each document becomes ceil-ish(n/stride) chunks of up to
    * `window` tokens starting every `stride` tokens (window > stride =>
    * consecutive chunks overlap by window-stride tokens, the standard
    * context-preserving recipe). Pure per-row array logic: tokenize
    * once, `transform` over the start-index sequence, ONE generator
    * (posexplode) — no join, no shuffle, no second tokenize per chunk,
    * so at 100 TB the operator is map-only and rides the scan.
    *
    * Output: (id, chunk_idx, n_tokens, chunk_md5, chunk_text). The md5
    * travels instead of re-hashing downstream; exact-dedup of chunks is
    * then a groupBy on it (q19's shape, one level down).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 40): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need window >= stride > 0, got window=$window stride=$stride")
    val toks = TextFunctions.words(col(textCol))
    docs
      .select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, int((size(toks) - 1) / $stride)), " +
            s"i -> slice(toks, i * $stride + 1, $window))"))
          .as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }

  /** Token co-occurrence PMI — the collocation/phrase-mining signal
    * (pointwise mutual information over document co-occurrence, ranked
    * as the EXACT scaled rational cxy*N*1e6 / (df_a*df_b): monotone in
    * PMI, so the ranking is identical, but pure BIGINT arithmetic — no
    * log, no float, no cross-engine rounding lottery).
    *
    * Cardinality discipline at 100 TB (PMI's naive form is
    * vocab^2-explosive):
    *  - the df band keeps only mid-frequency tokens — scale-RELATIVE
    *    (2 <= df, df*10 <= 8*N), so it binds identically at every sf
    *    instead of going empty/total under corpus growth;
    *  - pair generation is per-document over the df-banded token set —
    *    fan-out rides the per-doc BANDED vocab, never the corpus;
    *  - the co-occurrence floor is scale-relative too (cxy*20 >= N):
    *    a pair must appear in >= 5% of documents to surface.
    * Two shuffles total (df groupBy; pair groupBy) plus a broadcast of
    * the banded vocabulary.
    */
  /** DSIR-style importance weights (Xie et al.'s Data Selection via
    * Importance Resampling, public recipe): score every RAW document
    * by how target-like its hashed unigram features are — the
    * log-likelihood ratio sum  Σ_tokens log P_target(b)/P_raw(b)
    * over hashed feature buckets, with add-one smoothing. Documents
    * ranked by this weight are the classic cheap domain-selection
    * pass a 100 TB pretraining pipeline runs before expensive
    * curation.
    *
    * Engine-exactness discipline: buckets are md5-hex prefixes
    * (`hexChars` chars — 16^hexChars buckets; any SQL engine computes
    * the identical md5), bucket counts are exact integers, and the
    * per-BUCKET log ratio is computed ONCE from identical integer
    * operands then frozen to integer MICRO-nats — after which each
    * document's weight is an exact integer sum of its tokens'
    * bucket micros, independent of summation order. (A per-token
    * double sum would make the oracle hash a summation-order
    * lottery; the only residual cross-engine surface is ln()'s final
    * ulp against the half-micro rounding boundary — ~1e-9 odds per
    * bucket, the same class as q219's cents rounding.)
    *
    * Scale shape: one tokenize pass; bucket census is one hash-agg
    * over ≤ 16^hexChars keys; the log-ratio table is bucket-bounded
    * and BROADCAST back onto the token stream, so raw docs are scored
    * in a single shuffle on the doc id. Target rows shape the table
    * but are not scored (the selection pool is the raw side).
    *
    * @param isTarget boolean column marking the target-domain rows.
    * @return (`idCol`, weight_micros) for every raw document. */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, hexChars: Int = 3): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars in [1, 8] required, got $hexChars")
    val nBuckets = math.pow(16.0, hexChars.toDouble)
    val tok = docs
      .select(col(idCol).as("id"), isTarget.as("t"),
        explode(TextFunctions.words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .withColumn("b", substring(md5(col("term").cast("binary")), 1, hexChars))
    val counts = tok.groupBy(col("b")).agg(
      sum(when(col("t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("t"), 1L).otherwise(0L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lr = counts.crossJoin(broadcast(totals)).select(col("b"),
      round(log(
        ((col("ct") + 1).cast("double") * (col("nr") + lit(nBuckets))) /
          ((col("cr") + 1).cast("double") * (col("nt") + lit(nBuckets)))
      ) * lit(1000000.0)).cast("long").as("lr_micros"))
    tok.filter(!col("t"))
      .join(broadcast(lr), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("lr_micros")).as("weight_micros"))
      .select(col("id").as(idCol), col("weight_micros"))
  }

  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 100): DataFrame = {
    val t = docs
      .select(col(idCol).as("doc"), explode(TextFunctions.words(col(textCol))).as("t"))
      .distinct()
    val n = docs.select(countDistinct(col(idCol)).as("n"))
    val dfBand = t.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .join(broadcast(n), col("df") >= 2 && col("df") * 10 <= col("n") * 8)
    val td = t.join(broadcast(dfBand), Seq("t"))
    val right = td.select(col("doc"), col("t").as("t2"), col("df").as("df2"))
    td.join(right, Seq("doc"))
      .filter(col("t") < col("t2"))
      .groupBy(col("t").as("ta"), col("t2").as("tb"),
        col("df").as("dfa"), col("df2").as("dfb"), col("n"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") * 20 >= col("n"))
      .select(col("ta"), col("tb"), col("cxy").as("n_both"),
        col("dfa").as("df_a"), col("dfb").as("df_b"),
        expr("cxy * n * 1000000 div (dfa * dfb)").as("pmi_scaled"))
      .orderBy(col("pmi_scaled").desc, col("ta"), col("tb"))
      .limit(topK)
  }
}
