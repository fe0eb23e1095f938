package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.VectorFunctions

/** Deduplication operators for the LLM-data-pipeline surface
  * (SURVEY.md §2.10): exact, MinHash+LSH, SimHash, n-gram Jaccard and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedup is a hash-shuffle `groupBy` on the fingerprint — the
  *    canonical-form md5 keeps the shuffle key small (16 bytes) instead
  *    of shuffling full documents;
  *  - MinHash: shingle explode -> per-doc signature (one shuffle on
  *    doc_id) -> band values -> candidate join on (band, value). Join
  *    fan-out is bounded by bucket sizes, never all-pairs;
  *  - n-gram Jaccard at scale is the WIRED candidates->verify
  *    composition [[jaccardOnCandidates]] (used by the pipeline and
  *    oracle-verified as q43); the all-pairs [[jaccardPairs]] doubles
  *    as the oracle-checked ground truth at test SF;
  *  - thresholds are integer arithmetic (`common * q >= p * union`), so
  *    there is no float divergence between engines;
  *  - embedding near-dup at scale is [[embeddingNearDupsBucketed]]
  *    (sign-bucket prefilter + in-bucket cosine verify, oracle-verified
  *    as q42); brute-force [[embeddingNearDups]] is the test-SF ground
  *    truth;
  *  - degenerate hot buckets (stop-word shingles, band collisions) are
  *    capped by `maxBucket`, bounding group memory and pair fan-out.
  */
object Dedup {

  /** Exact dedup keyed on a canonical-form fingerprint: one row per
    * distinct content with the minimal id as the keeper and the copy
    * count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-source duplication report — the dedup-pressure dashboard row:
    * doc count, distinct-content count (within the source), and the
    * duplicate fraction. One hash agg on (source, 16-byte fingerprint)
    * then a per-source rollup; nothing quadratic, no text shuffled.
    * `n_unique` counts content distinct WITHIN its source — the same
    * content in two sources is no duplicate here (cross-source overlap
    * is [[dedupAgainstIndex]]'s question). */
  def dedupReport(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    df.select(col(srcCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy(col(srcCol), col("fp"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(srcCol))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_unique"))
      .withColumn("dup_rate",
        expr("CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE)"))

  /** Exploded distinct word-n-gram shingle table: (id, g).
    *
    * Formulated as posexplode + windowed `lead` rather than the
    * higher-order `transform` in [[TextFunctions.shingles]]: array HOFs
    * are interpreted (CodegenFallback), while the window runs codegen'd
    * after one shuffle on the doc id — and the downstream per-doc
    * aggregation (minhash) reuses that same hash partitioning, so it
    * adds no extra exchange. ~3x faster at sf0.1. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // Shuffle by doc id BEFORE tokenizing: the window below needs that
    // partitioning anyway, so this moves the (mandatory) exchange ahead
    // of the token explosion — it carries whole documents (fewer bytes
    // than exploded tokens) and spreads the CPU-heavy split/explode
    // across the cluster instead of leaving it at the scan's parallelism
    // (a small parquet file scans as one task).
    val tokens = df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol)).select(
      col(idCol),
      posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "w")))
    val parts = (0 until n).map {
      case 0 => col("w")
      case i => lead(col("w"), i).over(w)
    }
    tokens
      .select(col(idCol), concat_ws(" ", parts: _*).as("g"),
        parts.last.isNotNull.as("full"))
      .filter(col("full"))
      .select(col(idCol), col("g"))
      .distinct()
  }

  /** MinHash signature: `nHashes` minima over the shingle set, using the
    * 8 disjoint 4-hex-char (16-bit x2 = 32-bit) chunks of ONE md5 per
    * shingle as the hash family (md5 bits are uniform and independent
    * across chunks — the standard one-hash minhash trick). Cuts hashing
    * cost nHashes-fold vs salted per-hash digests. Lexicographic min
    * over hex chunks is engine-agnostic, so the DuckDB oracle is exact.
    * One shuffle (groupBy id) with map-side partial min. */
  def minhashSignature(
      df: DataFrame, idCol: String, textCol: String,
      nHashes: Int = 8, shingleN: Int = 3): DataFrame =
    minhashFromShingles(shingleTable(df, idCol, textCol, shingleN), idCol, nHashes)

  /** [[minhashSignature]]'s core over a PREBUILT (idCol, g) shingle
    * frame — exposed so a caller that materializes the shingle table
    * once (e.g. the streaming near-dedup batch, which needs shingles
    * for both banding and verification) can avoid re-running the
    * tokenize pipeline per consumer. */
  def minhashFromShingles(
      sh: DataFrame, idCol: String, nHashes: Int = 8): DataFrame = {
    require(nHashes <= 8, "one md5 yields 8 x 4-hex-char chunks")
    val hashed = sh.select(col(idCol), md5(col("g").cast("binary")).as("hg"))
    val aggs = (0 until nHashes).map(i =>
      min(substring(col("hg"), i * 4 + 1, 4)).as(s"h$i"))
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a minhash signature: bands of `rowsPerBand` hashes
    * hashed to one band value; docs sharing any (band, value) bucket are
    * candidate near-dups.
    *
    * Pairs are generated by grouping ids per bucket and exploding the
    * in-bucket combinations — NOT by self-joining the bucket table. A
    * self-join would execute the whole signature pipeline twice (Spark
    * does not share non-exchange subplans across join branches) and
    * shuffle the full bucket table both ways; the groupBy touches the
    * signature once. Bucket membership lists are tiny (only colliding
    * docs), so the pair-expansion lambda cost is negligible. */
  /** The exploded LSH band-value table of a minhash signature frame:
    * (id, band, bv) — nBands rows per doc, bv an md5 over the band's
    * hash components. This IS the durable near-dup index row format
    * ([[graft.streaming.NearDedupStream]] appends exactly these rows
    * per batch); [[lshCandidates]] derives in-batch candidate pairs by
    * bucketing it. */
  def bandTable(
      sig: DataFrame, idCol: String,
      nHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val nBands = nHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*).cast("binary")).as("bv"))
    }
    sig
      .select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("id"), col("bd.band").as("band"), col("bd.bv").as("bv"))
  }

  def lshCandidates(
      sig: DataFrame, idCol: String,
      nHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100000): DataFrame =
    lshCandidatesFromBands(bandTable(sig, idCol, nHashes, rowsPerBand), maxBucket)

  /** [[lshCandidates]]' bucket-group + pair-explode core over a
    * PREBUILT [[bandTable]] frame — for callers that reuse one
    * materialized band table across candidate generation and the
    * durable index write. */
  def lshCandidatesFromBands(
      bands: DataFrame, maxBucket: Int = 100000): DataFrame = {
    require(maxBucket >= 2, "maxBucket must allow at least one pair")
    bands
      .groupBy(col("band"), col("bv"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      // Hot-bucket cap (standard practice): a degenerate band value shared
      // by B docs would explode B^2/2 pairs from one group; buckets over
      // maxBucket carry no near-dup signal and are dropped. At test SF no
      // bucket approaches the cap, so oracle parity is unaffected.
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> named_struct('id_a', x, 'id_b', y))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** All-pairs n-gram Jaccard with an integer-arithmetic threshold
    * p/q (e.g. 1/2): keeps pairs with |A∩B| * q >= p * |A∪B|. At scale
    * this runs on LSH candidates; all-pairs is the test-SF oracle.
    *
    * Single-pass plan: the shingle table is computed ONCE — per-doc set
    * sizes ride along as a window count over the doc-id partitioning the
    * shingle table already has (no extra exchange), then docs sharing a
    * shingle are grouped per shingle value and in-bucket pairs exploded
    * (same no-self-join trick as [[lshCandidates]]; bucket sizes are
    * bounded by a shingle's document frequency). A self-join formulation
    * would execute the shingle pipeline twice and shuffle it both ways. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      p: Int = 1, q: Int = 2, shingleN: Int = 3,
      maxBucket: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxBucket >= 2, "maxBucket must allow at least one pair")
    val s = shingleTable(df, idCol, textCol, shingleN)
    val withN = s.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col(idCol))))
    withN
      .select(struct(col(idCol).as("id"), col("n")).as("m"), col("g"))
      .groupBy(col("g"))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      // Hot-shingle cap: a corpus-frequent shingle (stop-word trigram)
      // shared by B docs would hold B ids in one group and explode B^2/2
      // pairs. Shingles over maxBucket docs carry no similarity signal;
      // dropping them removes their `common` contribution (conservative —
      // Jaccard can only be underestimated). At test SF no shingle
      // approaches the cap, so oracle parity is unaffected.
      .filter(size(col("ms")) > 1 && size(col("ms")) <= maxBucket)
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms) - i - 1),
          |            y -> named_struct('id_a', x.id, 'n_a', x.n,
          |                              'id_b', y.id, 'n_b', y.n))))""".stripMargin)).as("pp"))
      .select(col("pp.id_a"), col("pp.n_a"), col("pp.id_b"), col("pp.n_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"), min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"))
      .withColumn("uni", col("n_a") + col("n_b") - col("common"))
      .filter(col("common") * q >= col("uni") * p)
      .select(col("id_a"), col("id_b"), col("common"), col("uni"))
  }

  /** Exact n-gram Jaccard restricted to the given candidate `pairs`
    * (columns id_a, id_b) — the verification half of the
    * candidates->verify near-dedup composition. Work is proportional to
    * |candidates| x shingles-per-doc, not to the all-pairs cross
    * product: the pair table joins each side's shingles on (id, g), so
    * the only rows surviving the second join are the SHARED shingles of
    * each candidate pair. Set sizes ride along from a window count over
    * the doc-id partitioning the shingle table already has.
    *
    * Note on caps: this verify is EXACT Jaccard — per-pair work is
    * bounded by document size, so no bucket cap applies here. The
    * `maxBucket` caps bound CANDIDATE GENERATION only
    * ([[lshCandidates]], and [[jaccardPairs]]'s per-shingle groups);
    * in the capped regime the capped all-pairs jaccardPairs is itself
    * an approximation, while this path stays exact on the candidates
    * it is given. */
  def jaccardVerify(
      df: DataFrame, pairs: DataFrame, idCol: String, textCol: String,
      p: Int = 1, q: Int = 2, shingleN: Int = 3): DataFrame =
    jaccardVerifyOnShingles(
      shingleTable(df, idCol, textCol, shingleN).withColumnRenamed(idCol, "id"),
      pairs, p, q)

  /** [[jaccardVerify]]'s member-explode core over a PREBUILT (id, g)
    * shingle frame — per-doc set sizes are derived here as a window
    * count, so a materialized shingle table can feed both the banding
    * and the verification without a second tokenize pass. */
  def jaccardVerifyOnShingles(
      shingles: DataFrame, pairs: DataFrame,
      p: Int = 1, q: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = shingles
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
    // Single-scan plan: a two-branch join (pairs⋈shinglesOfA, then
    // ⋈shinglesOfB) would execute the whole shingle pipeline TWICE —
    // Spark does not share non-exchange subplans across join branches
    // (the exact trap [[lshCandidates]]' docstring describes). Instead
    // each candidate pair is exploded into its two (pair, member-id,
    // side) rows and joined to the shingle table ONCE on the member id
    // (the shingle side reuses the id partitioning its window already
    // established — no extra exchange there). A shingle value seen
    // from BOTH sides of a pair is a shared shingle, so `common` is
    // the count of (pair, g) groups of size two — which is only sound
    // on DISTINCT pairs, so that is enforced here rather than assumed:
    // a duplicated pair would make every shared-shingle group size 4
    // and silently verify to common=0. The distinct shuffles two longs
    // per candidate, negligible next to the shingle join.
    val members = pairs.select(col("id_a"), col("id_b")).distinct()
      .select(
        struct(col("id_a"), col("id_b")).as("pk"),
        explode(array(
          struct(col("id_a").as("id"), lit(0).as("side")),
          struct(col("id_b").as("id"), lit(1).as("side")))).as("m"))
      .select(col("pk"), col("m.id").as("id"), col("m.side").as("side"))
    members
      .join(s, Seq("id"))
      .groupBy(col("pk"), col("g"))
      .agg(count(lit(1)).as("cnt"),
        max(when(col("side") === 0, col("n"))).as("na_g"),
        max(when(col("side") === 1, col("n"))).as("nb_g"))
      .groupBy(col("pk"))
      .agg(sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("common"),
        max(col("na_g")).as("n_a"), max(col("nb_g")).as("n_b"))
      .withColumn("uni", col("n_a") + col("n_b") - col("common"))
      .filter(col("common") * q >= col("uni") * p)
      .select(col("pk.id_a").as("id_a"), col("pk.id_b").as("id_b"),
        col("common"), col("uni"))
  }

  /** The 100 TB near-dedup path: MinHash/LSH candidate generation
    * followed by exact Jaccard verification on candidates only. Never
    * materializes anything quadratic — candidate volume is bounded by
    * band-bucket collisions (capped by `maxBucket`) and verification is
    * a per-candidate join. The all-pairs [[jaccardPairs]] is the test-SF
    * ground truth this composition is verified against (a pair it can
    * miss is one whose signature collides in no band — the standard LSH
    * recall trade, tuned via bands x rows). */
  def jaccardOnCandidates(
      df: DataFrame, idCol: String, textCol: String,
      p: Int = 1, q: Int = 2, shingleN: Int = 3,
      nHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100000): DataFrame = {
    // NOTE (r18 measurement): materializing the shingle table once via
    // localCheckpoint (the streamed batch's posture) was tried and made
    // every inline caller (q43/q45/q73/q171) 0.8-1.3 s SLOWER at sf0.1:
    // the shingle pipeline's exchanges are already reused across the
    // signature and verify branches, so the checkpoint only added a
    // serial materialization of the full shingle set. The streamed
    // batch path keeps its checkpoint because it ALSO needs the frame
    // across separate ACTIONS (per-batch writes), where reuse cannot
    // help — these are one-action plans. Left as lazy lineage.
    val sig = minhashSignature(df, idCol, textCol, nHashes, shingleN)
    val cand = lshCandidates(sig, idCol, nHashes, rowsPerBand, maxBucket)
    jaccardVerify(df, cand, idCol, textCol, p, q, shingleN)
  }

  /** Estimate-based near-dedup: LSH candidates scored by MinHash-sketch
    * component agreement (`n_agree / k` estimates Jaccard) instead of
    * exact shingle-set verification — the production shape when exact
    * verify is too expensive and a similarity ESTIMATE above a
    * threshold suffices. Uses [[graft.functions.MinHashSketchAgg]] with
    * the md5chunk16 family, so the estimate itself is oracle-exact.
    *
    * Per-pair work is O(k), independent of document size — vs
    * [[jaccardVerify]]'s O(shingles). The sketch frame is touched once
    * via the same member-explode shape as [[jaccardVerify]] (a
    * two-sided sketch join would run the sketch aggregation twice).
    * The corpus-tokenizing pipeline still executes twice per action —
    * once under the candidate branch, once under the estimate branch —
    * and that is irreducible without persistence no matter how the two
    * branches are formulated (deriving the estimate from the signature
    * frame just re-executes the signature subtree instead): two
    * consumers of one lazy frame always recompute it. At production
    * scale the sketch table is computed once by this UDAF, PERSISTED,
    * and both the banding and the estimate read it. */
  def sketchEstimatePairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minAgree: Int = 4, shingleN: Int = 3,
      nHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 100000): DataFrame = {
    val sig = minhashSignature(df, idCol, textCol, nHashes, shingleN)
    val cand = lshCandidates(sig, idCol, nHashes, rowsPerBand, maxBucket)
    val sketchParts = shingleTable(df, idCol, textCol, shingleN)
      .groupBy(col(idCol))
      .agg(graft.functions.MinHashSketchAgg
        .minhashSketch(col("g"), k, "md5chunk16").as("sk"))
      .select(col(idCol).as("id"), posexplode(col("sk")).as(Seq("i", "hi")))
    val members = cand.select(
      struct(col("id_a"), col("id_b")).as("pk"),
      explode(array(col("id_a"), col("id_b"))).as("id"))
    members.join(sketchParts, Seq("id"))
      .groupBy(col("pk"), col("i"))
      .agg((min(col("hi")) === max(col("hi"))).as("same"),
        count(lit(1)).as("nv"))
      .groupBy(col("pk"))
      .agg(sum(when(col("same") && col("nv") === 2, 1L).otherwise(0L)).as("n_agree"))
      .filter(col("n_agree") >= minAgree)
      .select(col("pk.id_a").as("id_a"), col("pk.id_b").as("id_b"), col("n_agree"))
  }

  /** 32-bit SimHash over word multiset, engine-agnostic construction:
    * bit k of a word = high bit of nibble k of md5(word) (md5 hex has
    * exactly 32 nibbles); simhash bit k is the sign of the sum of
    * (+1/-1) contributions. Integer arithmetic end-to-end. */
  def simhash32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // One aggregation with 32 conditional-sum columns (sign sum per bit)
    // instead of exploding 32 rows per word hash: the shuffle input stays
    // at the token count, with map-side partial sums of 32 longs per doc.
    // "high nibble bit set" == hex char in 8..f == char > '7' (md5 hex is
    // lowercase, so one comparison replaces an 8-way isin).
    val sumCols = (1 to 32).map { k =>
      sum(when(substring(col("h"), k, 1) > lit("7"), lit(1L)).otherwise(lit(-1L)))
        .as(s"s$k")
    }
    val folded = (1 to 32)
      .map(k => when(col(s"s$k") > 0, lit(1L << (k - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    // same early-shuffle trick as shingleTable: the groupBy needs the
    // id partitioning anyway; tokenize/md5 after the exchange so the
    // map work parallelizes beyond the scan's task count
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("w"))
      .select(col(idCol), md5(col("w").cast("binary")).as("h"))
      .groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col(idCol), folded.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, via the
    * block-partition trick (Manku et al., "Detecting Near-Duplicates for
    * Web Crawling", WWW'07): split the 32-bit hash into maxHamming+1
    * blocks — a pair within the budget must agree on >= 1 whole block
    * (pigeonhole), so bucketing by (block, value) finds ALL such pairs;
    * an exact bit_count(xor) filter then removes false candidates. The
    * result is exactly the brute-force O(n^2) answer without the n^2
    * scan. Same bucket-group + in-bucket pair explosion as
    * [[lshCandidates]] — the simhash pipeline runs once. */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 2): DataFrame = {
    val nBlocks = maxHamming + 1
    val base = 32 / nBlocks
    val widths = Seq.tabulate(nBlocks)(i => if (i < 32 % nBlocks) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val sh = simhash32(df, idCol, textCol)
    val blockCols = (0 until nBlocks).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), offsets(b)).bitwiseAND(lit((1L << widths(b)) - 1)).as("bv"))
    }
    sh.select(struct(col(idCol).as("id"), col("simhash").as("sh")).as("m"),
        explode(array(blockCols: _*)).as("bd"))
      .select(col("m"), col("bd.blk").as("blk"), col("bd.bv").as("bv"))
      .groupBy(col("blk"), col("bv"))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms) - i - 1),
          |            y -> named_struct('id_a', x.id, 'id_b', y.id,
          |                              'hamming', bit_count(x.sh ^ y.sh)))))""".stripMargin)).as("p"))
      .filter(col("p.hamming") <= maxHamming)
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming").cast("long").as("hamming"))
      .distinct()
  }

  /** Incremental exact dedup: the production flow at corpus scale —
    * a new batch is deduped against the ACCUMULATED corpus without
    * re-deduping the corpus itself. `index` is the fingerprint store
    * (one row per known content hash, e.g. `exactGroups(corpus)`'s fp
    * column, maintained as a table); survivors are new-batch docs whose
    * canonical fingerprint is unseen, minus in-batch duplicates (min id
    * wins, consistent with [[exactGroups]]). Shuffles 16-byte hashes
    * only; the index side is a semi-join probe, never materialized on
    * the driver. */
  def dedupAgainstIndex(
      newDocs: DataFrame, index: DataFrame,
      idCol: String, textCol: String, fpCol: String = "fp"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withFp = newDocs.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
    withFp
      .join(index.select(col(fpCol).as("fp")), Seq("fp"), "left_anti")
      .withColumn("keep_id",
        min(col(idCol)).over(Window.partitionBy(col("fp"))))
      .filter(col(idCol) === col("keep_id"))
      .drop("fp", "keep_id")
  }

  /** [[dedupAgainstIndex]] with an explicit bloom runtime filter: the
    * new batch's fingerprints are aggregated into a bloom sketch (one
    * distributed pass over the SMALL side, a bounded few-MB result),
    * and the accumulated index — the 100 TB side — is pruned by
    * [[graft.functions.BloomMightContain]] BEFORE its rows reach the
    * anti-join's shuffle. Identical output by construction: blooms have
    * no false negatives, so every index fingerprint that could match a
    * batch row survives the prune, and false positives are removed by
    * the exact anti-join that still runs. `fpp` (and an undersized
    * `expectedItems`) therefore only trade shuffle volume, never
    * correctness — the property q64's oracle (the same exact-dedup SQL
    * as q49's) verifies end-to-end.
    *
    * At real scale this is what Spark's adaptive runtime filtering
    * injects for selective shuffle joins; making it explicit keeps the
    * prune when the index scan is a pre-join pipeline (e.g. reading a
    * partitioned fingerprint store) where the planner has no join to
    * analyze yet. */
  def dedupAgainstIndexBloom(
      newDocs: DataFrame, index: DataFrame,
      idCol: String, textCol: String, fpCol: String = "fp",
      expectedItems: Long = 1L << 14, fpp: Double = 0.03): DataFrame = {
    val batchFps = newDocs
      .select(TextFunctions.fingerprint(col(textCol)).as("fp"))
    val bloom = batchFps.stat.bloomFilter("fp", expectedItems, fpp)
    val prunedIndex = index.filter(
      graft.functions.BloomMightContain.bloomMightContain(col(fpCol), bloom))
    dedupAgainstIndex(newDocs, prunedIndex, idCol, textCol, fpCol)
  }

  /** Embedding-cosine near-dup pairs above `threshold` (id-only output;
    * the cosine itself is float-precision-sensitive across engines).
    * Brute force at test SF; sign-bucket prefilter at scale. */
  def embeddingNearDups(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    // the O(n^2) cosine kernel runs in the STREAM side's scan tasks of
    // the nested-loop join — widen a narrow input so it parallelizes
    // (no-op at real scale; [[graft.similarity.Similarity.widened]])
    val a = graft.similarity.Similarity.widened(
      emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a")))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    // broadcast pinned to the UN-widened side so the widened scan stays
    // the parallel stream side (and the plan can't flip between runs)
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosineSim(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** The 100 TB embedding near-dup path: bucket by deterministic
    * random-hyperplane signs ([[graft.similarity.Similarity.signBuckets]]),
    * then exact-cosine verify INSIDE each bucket only. Work is the sum
    * of squared bucket sizes (expected n^2 / 2^nBits for random data),
    * never the full cross product; `maxBucket` bounds the degenerate
    * all-vectors-one-bucket case. Recall vs [[embeddingNearDups]] is
    * the standard sign-LSH trade — a pair is found iff no hyperplane
    * separates it (all nBits signs agree), tuned via nBits / probing.
    *
    * Same single-pass shape as [[lshCandidates]]: vectors ride through
    * the bucket groupBy as struct payloads, so the embedding scan runs
    * once and the verify cosine is the codegen'd expression on exploded
    * pairs (the pair-listing HOF itself does no arithmetic).
    *
    * The `maxBucket` default here is far lower than the id-only caps in
    * [[lshCandidates]]/[[jaccardPairs]]: each bucket member carries its
    * FULL vector through `collect_list` (dim x 4 bytes, ~260 B/row at
    * dim=64 vs 16 B for a hash), so 4096 bounds a group at ~1 MB where
    * the id caps' 100k would allow ~50 MB single aggregation groups.
    * Raise nBits (more, smaller buckets) before raising the cap. */
  def embeddingNearDupsBucketed(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nBits: Int = 4, dim: Int = 64, maxBucket: Int = 4096): DataFrame = {
    val b = graft.similarity.Similarity
      .signBuckets(emb, idCol, vecCol, nBits, dim)
      .select(struct(col(idCol).as("id"), col(vecCol).as("v")).as("m"), col("bucket"))
    pairsWithinGroups(b, "bucket", threshold, maxBucket)
  }

  /** Semantic dedup over an embedding column — the SemDeDup recipe
    * (cluster the embedding space, then look for near-duplicates only
    * WITHIN each cluster, where semantically-identical documents
    * concentrate): cells come from the deterministic IVF coarse
    * quantizer ([[graft.similarity.Similarity.ivfAssignCells]] — the
    * same md5-ranked centroids + argmin-L2 assignment the ANN family
    * serves from, so one clustering artifact can back BOTH the ANN
    * index and the dedup pass), exact cosine >= `threshold` verifies
    * inside a cell, and the larger id of each verified pair drops.
    * Returns the SURVIVING rows of `emb`.
    *
    * The cell restriction is [[embeddingNearDupsBucketed]]'s bucket
    * restriction with a data-dependent partitioner: sign-LSH buckets cut
    * the space with fixed random hyperplanes, while centroids follow
    * the corpus distribution — on clustered real-world embeddings the
    * cell sizes track the clusters, which is where semantic duplicates
    * live. Work is the sum of squared cell sizes, never |corpus|^2;
    * `maxCell` bounds the degenerate case exactly as `maxBucket` does
    * (vector-carrying groups, so the cap stays at 4096 ~ 1 MB/group at
    * dim=64; raise nLists before raising the cap). Recall misses only
    * pairs the quantizer separates — the standard SemDeDup trade, tuned
    * by nLists. */
  def semanticDedup(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nLists: Int = 8, maxCell: Int = 4096): DataFrame = {
    val dropped = semanticPairs(emb, idCol, vecCol, threshold, nLists, maxCell)
      .select(col("id_b").as("_drop_id")).distinct()
    emb.join(dropped, emb(idCol) === col("_drop_id"), "left_anti")
  }

  /** The verified semantic near-dup PAIR list (id_a < id_b) behind
    * [[semanticDedup]]'s drop policy — exposed so cluster-level keeper
    * policies can act on whole duplicate groups instead of pairwise
    * evidence (exactly the [[jaccardOnCandidates]] →
    * [[Clusters.connectedComponents]] relationship on the text side). */
  def semanticPairs(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nLists: Int = 8, maxCell: Int = 4096): DataFrame = {
    val cells = graft.similarity.Similarity
      .ivfAssignCells(emb, idCol, vecCol, nLists)
      .select(struct(col(idCol).as("id"), col(vecCol).as("v")).as("m"), col("cell"))
    pairsWithinGroups(cells, "cell", threshold, maxCell)
  }

  /** Quality-aware SemDeDup: the cluster-keeper policy
    * ([[Clusters.keepersByScore]], q73's construction) applied to the
    * EMBEDDING duplicate graph — verified semantic pairs become edges,
    * connected components turn pairwise evidence into whole duplicate
    * groups, and the best-scoring member of each group (then min id)
    * survives. Fixes the same two artifacts of pairwise
    * drop-the-larger-id that motivated q73 on the text side: transitive
    * chains over-drop, and "keep the best member" is inexpressible.
    * `scores` carries one row per embedding (`idCol`, `scoreCol`) —
    * e.g. a text-quality score joined over a shared document id.
    * Returns (`idCol`, cluster_id, `scoreCol`) — one keeper row per
    * component, singletons included, so the result IS the deduped id
    * set. */
  def semanticDedupKeepBest(
      emb: DataFrame, idCol: String, vecCol: String,
      scores: DataFrame, scoreCol: String, threshold: Double,
      nLists: Int = 8, maxCell: Int = 4096,
      checkpointDir: Option[String] = None): DataFrame = {
    val edges = semanticPairs(emb, idCol, vecCol, threshold, nLists, maxCell)
    val cc = Clusters.connectedComponents(
      emb.select(col(idCol)), idCol, edges, checkpointDir = checkpointDir)
    Clusters.keepersByScore(cc, scores, idCol, scoreCol)
  }

  /** Shared within-group exact-cosine verify: members ride the groupBy
    * as (id, vector) structs so the embedding scan runs once, ordered
    * pairs explode from each bounded group, and the codegen'd cosine
    * filters them. Groups over `maxGroup` members are pruned (the
    * documented recall-for-boundedness cap of both callers). */
  private[graft] def pairsWithinGroups(
      tagged: DataFrame, groupCol: String, threshold: Double,
      maxGroup: Int): DataFrame =
    tagged.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .filter(size(col("ms")) > 1 && size(col("ms")) <= maxGroup)
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms) - i - 1),
          |            y -> named_struct('id_a', x.id, 'v_a', x.v,
          |                              'id_b', y.id, 'v_b', y.v))))""".stripMargin)).as("p"))
      .filter(VectorFunctions.cosineSim(col("p.v_a"), col("p.v_b")) >= threshold)
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))

  /** COMPLETE edit-distance-1 pair mining over a term vocabulary — the
    * typo/variant-merging face of the dedup family (OCR noise, casing
    * drift, plural/singular near-misses in a 100 TB crawl vocabulary).
    *
    * Blocking is the union of two EQUI-joins — same first character,
    * same last character — each with a +-1 length band, and that dual
    * blocking is LOSSLESS for levenshtein <= 1 over terms of length
    * >= 2: a single substitution not at position 0 preserves the first
    * character, one at position 0 preserves the last (length >= 2);
    * an insert/delete not at the front preserves the first character,
    * and one at the front preserves the last (the shorter string is a
    * suffix). So every qualifying pair appears in at least one block
    * and the levenshtein filter never sees an all-pairs product —
    * candidate fan-out is bounded by block sizes (vocabulary-bounded,
    * never corpus-bounded; at larger alphabets compose the block key
    * with a length band exactly as [[lshCandidates]] bands signatures).
    * Pairs are oriented `a < b` and deduped BEFORE the levenshtein so
    * the edit-distance kernel runs once per unique candidate. */
  /** DIRECTIONAL shingle containment — the quote/boilerplate detector
    * Jaccard structurally misses: a short document fully quoted inside
    * a long one has tiny Jaccard (union is the long doc) but
    * containment |A∩B|/|A| near 1. Pairs (contained -> container) with
    * `common * q >= p * |A|` over the df-capped shingle space:
    * shingles appearing in more than `maxDf` documents are dropped ON
    * BOTH SIDES of the ratio (sizes and intersections alike), which
    * (a) bounds the inverted-index join's fan-out per shingle — the
    * scale guarantee, common boilerplate n-grams are exactly the hot
    * keys — and (b) keeps the operator a pure deterministic function
    * an oracle can mirror. Threshold is integer arithmetic (no float
    * division), like every dedup gate here. */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      p: Int, q: Int, shingleN: Int = 3, maxDf: Int = 100000): DataFrame = {
    // the shingle expression is the expensive map stage here; a narrow
    // input (one small parquet file -> one partition) would run it on
    // ONE core before the first shuffle parallelizes anything. Widen
    // narrow inputs to the cluster's parallelism first — at real scale
    // the scan already has more partitions than cores and this is a
    // no-op (no shuffle of raw text is ever added on the 100 TB path)
    val src = df.select(col(idCol).as("doc"), col(textCol).as("txt"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val wide =
      if (src.rdd.getNumPartitions < par) src.repartition(par) else src
    val sh = wide.select(col("doc"),
        explode(TextFunctions.shingles(col("txt"), shingleN)).as("sh"))
      .distinct()
    val kept = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("sh"))
    // the capped shingle table feeds THREE consumers (sizes + both join
    // sides) — persist it once instead of re-tokenizing per consumer
    // (the posture sketchEstimatePairs documents as requiring
    // persistence at production scale, applied); the result is
    // threshold-bounded and small, so an eager local checkpoint lets
    // the persisted frame unpin deterministically
    val s2 = sh.join(kept, Seq("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = s2.groupBy(col("doc")).agg(count(lit(1)).as("n"))
      // |A∩B| is symmetric: aggregate each unordered pair ONCE (a < b
      // halves the join output and the pair shuffle), then surface both
      // directions — each with its own |A| — for the directional gate
      val ordered = s2.select(col("doc").as("id_a"), col("sh"))
        .join(s2.select(col("doc").as("id_b"), col("sh")), Seq("sh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
      val both = ordered.union(ordered.select(
        col("id_b").as("id_a"), col("id_a").as("id_b"), col("common")))
      both.join(sizes.withColumnRenamed("doc", "id_a"), "id_a")
        .filter(col("common") * q >= col("n") * p)
        .select(col("id_a"), col("id_b"), col("common"), col("n").as("size_a"))
        .localCheckpoint(eager = true)
    } finally s2.unpersist()
  }

  def editDistancePairs(vocab: DataFrame, termCol: String): DataFrame = {
    val base = vocab.select(col(termCol).as("t")).distinct()
      .filter(length(col("t")) >= 2)
    def side(n: String) = base.select(
      col("t").as(n),
      substring(col("t"), 1, 1).as(s"f$n"),
      substring(col("t"), -1, 1).as(s"l$n"),
      length(col("t")).as(s"n$n"))
    val a = side("a")
    val b = side("b")
    val band = col("a") < col("b") && abs(col("na") - col("nb")) <= 1
    val byFirst = a.join(b, col("fa") === col("fb") && band)
    val byLast = a.join(b, col("la") === col("lb") && band)
    byFirst.select(col("a"), col("b"))
      .union(byLast.select(col("a"), col("b")))
      .distinct()
      .filter(levenshtein(col("a"), col("b")) <= 1)
  }

  /** Blocked Jaro-Winkler best-match name linkage: for every DISTINCT
    * name, the single highest-scoring OTHER name in its block at or
    * above `thresholdMicros` (score in integer micro-units — no raw
    * doubles travel), plus how many records carry the name (`n_rows`,
    * so a merge decision knows each variant's support) and how many
    * above-threshold candidates it had (`n_cands`).
    *
    * Working on the distinct-name domain is the 100 TB design point:
    * name vocabularies grow sub-linearly in records (here 64 names
    * over 20k parts), so the O(len^2) JW kernel runs per VOCAB pair,
    * never per record pair — the same vocabulary-bounded posture as
    * q138's edit-distance mining. (A per-record variant measured 13.7s
    * at sf0.1 — 24M kernel calls re-scoring identical strings; this
    * form is ~200 calls for the same linkage decisions.)
    *
    * The block key is the name's first token plus a +-`lenBand` length
    * band — standard recall-bounded linkage blocking; the pair stream
    * stays a bounded equi-join (no cartesian; spec-asserted). JW runs
    * ONCE per unordered pair (it is symmetric) and mirrors; the
    * per-name top-1 is one window pass ordered (jw desc, match name)
    * so ties break deterministically in any engine.
    */
  def jaroWinklerBestMatch(records: DataFrame, nameCol: String,
      thresholdMicros: Long = 850000L, lenBand: Int = 2): DataFrame = {
    val base = records.groupBy(col(nameCol).as("nm"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", split_part(col("nm"), lit(" "), lit(1)))
      .withColumn("ln", length(col("nm")))
    val a = base.select(col("nm").as("na"), col("blk"), col("ln").as("la"))
    val b = base.select(col("nm").as("nb"), col("blk"), col("ln").as("lb"))
    val scored = a.join(b, Seq("blk"))
      .filter(col("na") < col("nb") && abs(col("la") - col("lb")) <= lenBand)
      .select(col("na"), col("nb"),
        round(graft.functions.JaroWinklerSim.jaroWinklerSim(col("na"), col("nb"))
          * lit(1000000.0)).cast("long").as("jw"))
      .filter(col("jw") >= thresholdMicros)
    val mirrored = scored.select(col("na").as("nm"), col("nb").as("match_nm"), col("jw"))
      .union(scored.select(col("nb").as("nm"), col("na").as("match_nm"), col("jw")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("nm"))
    val ranked = mirrored
      .withColumn("rn", row_number().over(w.orderBy(col("jw").desc, col("match_nm"))))
      .withColumn("n_cands", count(lit(1)).over(w))
    ranked.filter(col("rn") === 1)
      .join(base.select(col("nm"), col("n_rows")), Seq("nm"))
      .select(col("nm").as("name"), col("match_nm").as("match_name"),
        col("jw").as("jw_micros"), col("n_cands"), col("n_rows"))
  }

  /** EXACT set-similarity join via prefix filtering (SSJoin/PPJoin
    * family: Chaudhuri et al. 2006, Bayardo et al. 2007) — every pair
    * of documents whose distinct-shingle sets have Jaccard >= p/q,
    * found WITHOUT the full inverted-index join that LSH (q21/q43)
    * approximates away: order each set by ascending document
    * frequency (rarest first, ties by value — one global order both
    * sides share), take the first n - ceil(t*n) + 1 elements as the
    * prefix, and join ONLY on prefix elements. The prefix-filter
    * theorem makes this LOSSLESS for Jaccard >= t: two sets meeting
    * the threshold must share a prefix element, so completeness is
    * provable — and the oracle proves it per run, because it mines
    * the same pairs with NO prefix filter (full inverted index): any
    * pair the prefix join missed would hash-mismatch.
    *
    * 100 TB posture: candidate fan-out rides the df of the RAREST
    * elements of each set (the prefix), not the hottest — the exact
    * opposite of the naive inverted index, whose cost is sum(df^2)
    * over the most common shingles. Verification joins the bounded
    * candidate pairs back to the two set arrays and intersects
    * per-row (codegen'd array_intersect), never re-exploding. The
    * threshold compare is pure-integer (q*common >= p*union).
    */
  def prefixFilterJoin(docs: DataFrame, idCol: String, textCol: String,
      p: Int = 8, q: Int = 10, shingleN: Int = 3): DataFrame = {
    require(p > 0 && q > 0 && p <= q, s"need 0 < p <= q, got p=$p q=$q")
    val sh = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), shingleN)).as("sh"))
      .distinct()
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // NOTE (r18 measurement): materializing this frame once via
    // localCheckpoint was tried and made q161 ~3x SLOWER at sf0.1 —
    // exchange reuse already dedups the expensive shuffle across the
    // three consumer branches, and the eager checkpoint only added a
    // serial barrier plus block-manager writes of the full set arrays.
    // Left as lazy lineage deliberately.
    val arr = sh.join(broadcast(df), Seq("sh"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("a"))
      .select(col("id"), expr("transform(a, x -> x.sh)").as("set"),
        size(col("a")).as("n"))
    // prefix length n - ceil(t*n) + 1 with t = p/q, all integer:
    // ceil(p*n/q) = (p*n + q - 1) div q
    val pre = arr.select(col("id"),
      explode(expr(s"slice(set, 1, n - ((${p} * n + ${q} - 1) div ${q}) + 1)"))
        .as("sh"))
    val cand = pre.join(pre.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .distinct()
    val a = arr.select(col("id").as("id_a"), col("set").as("set_a"),
      col("n").as("n_a"))
    val b = arr.select(col("id").as("id_b"), col("set").as("set_b"),
      col("n").as("n_b"))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("common",
        size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .filter(col("common") * q >= (col("n_a") + col("n_b") - col("common")) * p)
      .select(col("id_a"), col("id_b"), col("common"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
  }
}
