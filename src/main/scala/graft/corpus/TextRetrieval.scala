package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical top-k retrieval — the text-side sibling of the embedding ANN
  * family ([[graft.similarity.Similarity]]): BM25 (Robertson/Walker,
  * the Lucene-default formulation with the +1 inside the log so scores
  * stay non-negative) over the corpus' own whitespace tokenization.
  * What the dedup pipeline uses MinHash for (set overlap), retrieval
  * uses BM25 for (ranked relevance) — "find the k most lexically
  * similar documents to this one" is the curation query behind
  * more-like-this expansion, lexical near-dup triage, and
  * contamination forensics.
  *
  * score(q, d) = sum over query terms t of
  *   ln(1 + (N - df + 0.5) / (df + 0.5))
  *     * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len/avgdl))
  *
  * Scale shape (100 TB): the corpus is scanned ONCE into the per-(doc,
  * term) tf table (one hash agg); the query-term set broadcasts into a
  * semi-restriction of that table BEFORE anything else, so df counting
  * and scoring touch only postings of terms some query actually uses —
  * the inverted-index access pattern without materializing an index.
  * Per-term document frequencies for the restricted vocabulary and the
  * two global scalars (N, total length) are the only other aggregates;
  * the final per-(query, doc) sum shuffles (qid, doc_id) pairs. Skewed
  * stopword postings are the classic hazard: cap them out with
  * `maxPostings` (terms matching more than that many documents carry
  * ~zero idf anyway — the standard stop-list-by-frequency trade).
  */
object TextRetrieval {

  /** BM25 top-k per query. `queries` carries (`qIdCol`, `qTextCol`);
    * its distinct tokens are the query terms. Returns (query_id, rank,
    * doc_id), rank 1..k by (score desc, doc_id). `excludeSelf` drops
    * doc_id == query_id candidates — the more-like-this contract when
    * queries ARE corpus documents. Terms with more than `maxPostings`
    * matching documents are dropped from scoring (near-zero idf,
    * unbounded fan-out). */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      maxPostings: Long = 100000L): DataFrame =
    bm25TopKFromPostings(
      postings(docs, idCol, textCol),
      queries, qIdCol, qTextCol, k, k1, b, excludeSelf, maxPostings)

  /** The postings table — ONE corpus scan to (doc_id, term, tf). This
    * IS the durable row format [[graft.streaming.PostingsStream]]
    * stores per batch: every BM25 statistic (df, doc length, N, total
    * length) is an associative integer aggregate of these rows, so
    * scoring over a union of stored batches is EXACTLY scoring over
    * the union corpus — no approximation in incremental maintenance. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** POSITIONAL postings — (doc_id, pos, term), the row format phrase
    * and proximity search read. Like [[postings]] this is the durable
    * shape: stored once, a phrase query then touches only its own
    * terms' rows (a scan-level `term IN (...)` pushdown), never the
    * text. */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "term")))

  /** Phrase + proximity match from positional postings: documents
    * where `second` occurs within `slop` positions AFTER `first`;
    * `phrase_tf` counts exact adjacency (the quoted-phrase hit count),
    * `near_tf` all in-window pairs (the proximity relaxation —
    * slop > 1 is how a retrieval stack serves "A near B"). The two
    * term branches filter BEFORE the join, so the join input is
    * bounded by the terms' posting lists — at 100 TB two selective
    * index lookups merged on doc_id (a hash join with the position
    * window as residual), never an all-positions self-join. Output
    * ordered (phrase_tf DESC, near_tf DESC, doc_id) — total because
    * doc_id is unique per group. */
  def phraseFromPostings(
      postings: DataFrame, first: String, second: String,
      slop: Int = 1): DataFrame = {
    val a = postings.filter(col("term") === first)
      .select(col("doc_id"), col("pos").as("pa"))
    val b = postings.filter(col("term") === second)
      .select(col("doc_id"), col("pos").as("pb"))
    a.join(b, Seq("doc_id"))
      .filter(col("pb") >= col("pa") + 1 && col("pb") <= col("pa") + lit(slop))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("pb") === col("pa") + 1, 1L).otherwise(0L))
          .cast("long").as("phrase_tf"),
        count(lit(1)).as("near_tf"))
      .orderBy(col("phrase_tf").desc, col("near_tf").desc, col("doc_id"))
  }

  /** BM25 over an existing postings table (see [[postings]]). All
    * corpus statistics derive from the rows themselves.
    *
    * Cost note: the N/avgdl scalar job and the scoring job each
    * execute the `tf` lineage once — for [[bm25TopK]] that means the
    * corpus tokenizes twice (the documented q45-style lazy-lineage
    * trade; persisting a corpus-sized token table by default would be
    * worse). The durable store
    * ([[graft.streaming.PostingsStream]]) is the production shape:
    * there `tf` is a columnar parquet scan, tokenized never. */
  def bm25TopKFromPostings(
      tf: DataFrame,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      maxPostings: Long = 100000L): DataFrame =
    bm25TopKFromTerms(tf, queryTerms(queries, qIdCol, qTextCol),
      k, k1, b, excludeSelf, maxPostings)

  /** The distinct (query_id, term) set a query text contributes — the
    * ONLY thing BM25 and term-overlap need from the query side (tf on
    * the query side never enters either formula), which is why a
    * stored doc's postings rows can stand in for its text
    * ([[graft.streaming.PostingsStream.moreLikeThis]]). */
  def queryTerms(
      queries: DataFrame, qIdCol: String, qTextCol: String): DataFrame =
    queries
      .select(col(qIdCol).as("query_id"),
        explode(TextFunctions.words(col(qTextCol))).as("term"))
      .distinct()

  /** BM25 over a postings table with the query side already reduced to
    * its distinct (query_id, term) rows (see [[queryTerms]]). */
  def bm25TopKFromTerms(
      tf: DataFrame, qTerms: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      maxPostings: Long = 100000L): DataFrame = {
    val len = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    // the two global scalars (N, avgdl) ride the plan as a broadcast
    // one-row aggregate instead of a driver-side collect: the collect
    // was a SECOND full execution of the tf lineage (for the inline
    // variants, a second corpus tokenize; for the stored variants, a
    // second store scan) spent deriving two numbers the same pass can
    // carry. Exact integer sums either way, and the scoring expression
    // divides the identical IEEE operands (long->double cast, same op
    // order), so scores are bit-identical.
    val g = len.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("tot_len"))
      .select(col("n_docs"),
        when(col("n_docs") === 0L, lit(1.0))
          .otherwise(col("tot_len").cast("double") /
            col("n_docs").cast("double")).as("avgdl"))
    // restrict the postings to query vocabulary FIRST (broadcast
    // semi-join): df counted after the restriction is still the true
    // per-term document count — the restriction is by term, not by doc
    val tfq = tf.join(broadcast(qTerms.select(col("term")).distinct()),
      Seq("term"), "left_semi")
    val dfT = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxPostings)

    val contrib = tfq
      .join(broadcast(dfT), Seq("term"))
      .join(len, Seq("doc_id"))
      .join(broadcast(qTerms), Seq("term"))
      .crossJoin(broadcast(g))
      .withColumn("c",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * (lit(k1) + lit(1.0))
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / col("avgdl"))))
    val scored0 = contrib
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"))
    val scored =
      if (excludeSelf) scored0.filter(col("doc_id") =!= col("query_id"))
      else scored0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }

  /** Shared-shingle top-k: candidates ranked by the number of distinct
    * word n-grams they share with the query — the fuzzy-overlap ranker
    * (exact integer counts, the retrieval face of the Jaccard-verify
    * dedup machinery). Query shingles broadcast; candidates generated
    * only for docs sharing at least one shingle. */
  def overlapTopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, shingleN: Int = 3, excludeSelf: Boolean = false): DataFrame = {
    val sh = graft.dedup.Dedup.shingleTable(docs, idCol, textCol, shingleN)
      .select(col(idCol).as("doc_id"), col("g"))
    val qs = graft.dedup.Dedup.shingleTable(queries, qIdCol, qTextCol, shingleN)
      .select(col(qIdCol).as("query_id"), col("g"))
    val pairs = sh.join(broadcast(qs), Seq("g"))
    val filtered =
      if (excludeSelf) pairs.filter(col("doc_id") =!= col("query_id"))
      else pairs
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("shared").desc, col("doc_id"))
    filtered
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion (RRF, Cormack et al.):
    * BM25's term-weighted ranking and the shingle-overlap ranking each
    * nominate a `poolK` candidate pool per query, and candidates are
    * re-ranked by sum of 1 / (rrfK + rank) over the lists that
    * nominated them — the standard zero-tuning ensemble that rewards
    * agreement without comparing incommensurable scores. The fusion
    * arithmetic is EXACTLY reproducible across engines: each reciprocal
    * divides identical operands and at most two terms add (double
    * addition is commutative), so only the BM25 input ranks carry the
    * usual score-gap margins. Both input rankings are one retrieval
    * pass each; the fusion itself is a join of two k-bounded rank
    * lists — negligible at any scale. */
  def hybridRrfTopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, poolK: Int = 20, rrfK: Int = 60,
      shingleN: Int = 3, excludeSelf: Boolean = false,
      k1: Double = 1.2, b: Double = 0.75,
      maxPostings: Long = 100000L): DataFrame =
    rrfFuse(
      bm25TopK(docs, idCol, textCol, queries, qIdCol, qTextCol,
        poolK, k1, b, excludeSelf, maxPostings),
      overlapTopK(docs, idCol, textCol, queries, qIdCol, qTextCol,
        poolK, shingleN, excludeSelf),
      rrfK, k)

  /** RRF over two (query_id, rank, doc_id) rank lists — the fusion
    * half of [[hybridRrfTopK]], shared with the store-served variant so
    * the arithmetic can never drift between the two. */
  private def rrfFuse(
      a: DataFrame, b: DataFrame, rrfK: Int, k: Int): DataFrame = {
    val ra = a.select(col("query_id"), col("doc_id"), col("rank").as("ra"))
    val rb = b.select(col("query_id"), col("doc_id"), col("rank").as("rb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    ra.join(rb, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("score",
        coalesce(lit(1.0) / (lit(rrfK) + col("ra")), lit(0.0))
          + coalesce(lit(1.0) / (lit(rrfK) + col("rb")), lit(0.0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }

  /** Shared-TERM top-k from a postings table: candidates ranked by the
    * number of distinct terms they share with the query — the overlap
    * arm computable from (doc_id, term) rows ALONE, which is what lets
    * hybrid retrieval serve entirely from the durable postings store
    * (the shingle arm of [[overlapTopK]] needs word ORDER, which
    * postings deliberately do not keep). Same access pattern as BM25:
    * query vocabulary broadcasts, only postings of query terms are
    * touched, exact integer counts. */
  def termOverlapTopKFromTerms(
      tf: DataFrame, qTerms: DataFrame,
      k: Int, excludeSelf: Boolean = false): DataFrame = {
    val pairs = tf.select(col("doc_id"), col("term"))
      .join(broadcast(qTerms), Seq("term"))
    val filtered =
      if (excludeSelf) pairs.filter(col("doc_id") =!= col("query_id"))
      else pairs
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("shared").desc, col("doc_id"))
    filtered
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }

  /** Hybrid RRF with BOTH arms served from one postings table: stored
    * BM25 ([[bm25TopKFromTerms]]) fused with distinct-shared-term
    * overlap ([[termOverlapTopKFromTerms]]) — more-like-this serving
    * that never reads or re-tokenizes a document. The postings lineage
    * is shared by the two arms (one columnar scan each over the same
    * store; the arms need different aggregates of it). */
  def hybridRrfFromTerms(
      tf: DataFrame, qTerms: DataFrame,
      k: Int, poolK: Int = 20, rrfK: Int = 60,
      excludeSelf: Boolean = false,
      k1: Double = 1.2, b: Double = 0.75,
      maxPostings: Long = 100000L): DataFrame =
    rrfFuse(
      bm25TopKFromTerms(tf, qTerms, poolK, k1, b, excludeSelf, maxPostings),
      termOverlapTopKFromTerms(tf, qTerms, poolK, excludeSelf),
      rrfK, k)
}
