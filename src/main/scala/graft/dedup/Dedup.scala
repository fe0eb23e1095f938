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
  *  - n-gram Jaccard runs on LSH *candidates* at scale; the all-pairs
  *    variant here doubles as the oracle-checked ground truth at test SF;
  *  - thresholds are integer arithmetic (`common * q >= p * union`), so
  *    there is no float divergence between engines;
  *  - embedding near-dup: brute-force O(n^2) at test SF (oracle ground
  *    truth); the scale path buckets by SimHash-style hyperplane signs
  *    first (see `graft.similarity.Similarity.signBuckets`).
  */
object Dedup {

  /** Exact dedup keyed on a canonical-form fingerprint: one row per
    * distinct content with the minimal id as the keeper and the copy
    * count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exploded distinct word-n-gram shingle table: (id, g). */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol), explode(TextFunctions.shingles(col(textCol), n)).as("g"))
      .distinct()

  /** MinHash signature: `nHashes` salted-md5 minima over the shingle set.
    * Lexicographic min over hex digests — engine-agnostic, so the DuckDB
    * oracle is exact. One shuffle (groupBy id); partial min is map-side. */
  def minhashSignature(
      df: DataFrame, idCol: String, textCol: String,
      nHashes: Int = 8, shingleN: Int = 3): DataFrame = {
    val sh = shingleTable(df, idCol, textCol, shingleN)
    val aggs = (0 until nHashes).map(i =>
      min(md5(concat(lit(s"$i:"), col("g")).cast("binary"))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a minhash signature: bands of `rowsPerBand` hashes
    * hashed to one band value; docs sharing any (band, value) bucket are
    * candidate near-dups. */
  def lshCandidates(
      sig: DataFrame, idCol: String,
      nHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val nBands = nHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*).cast("binary")).as("bv"))
    }
    val buckets = sig
      .select(col(idCol), explode(array(bandCols: _*)).as("bd"))
      .select(col(idCol), col("bd.band").as("band"), col("bd.bv").as("bv"))
    val a = buckets.toDF(Seq("id_a", "band", "bv"): _*)
    val b = buckets.toDF(Seq("id_b", "band", "bv"): _*)
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** All-pairs n-gram Jaccard with an integer-arithmetic threshold
    * p/q (e.g. 1/2): keeps pairs with |A∩B| * q >= p * |A∪B|. At scale
    * this runs on LSH candidates; all-pairs is the test-SF oracle. */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      p: Int = 1, q: Int = 2, shingleN: Int = 3): DataFrame = {
    val s = shingleTable(df, idCol, textCol, shingleN)
    val sizes = s.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = s.toDF(Seq("id_a", "g"): _*)
    val b = s.toDF(Seq("id_b", "g"): _*)
    val common = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    val na = sizes.toDF(Seq("id_a", "n_a"): _*)
    val nb = sizes.toDF(Seq("id_b", "n_b"): _*)
    common
      .join(broadcast(na), Seq("id_a"))
      .join(broadcast(nb), Seq("id_b"))
      .withColumn("uni", col("n_a") + col("n_b") - col("common"))
      .filter(col("common") * q >= col("uni") * p)
      .select(col("id_a"), col("id_b"), col("common"), col("uni"))
  }

  /** 32-bit SimHash over word multiset, engine-agnostic construction:
    * bit k of a word = high bit of nibble k of md5(word) (md5 hex has
    * exactly 32 nibbles); simhash bit k is the sign of the sum of
    * (+1/-1) contributions. Integer arithmetic end-to-end. */
  def simhash32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    df.select(col(idCol), explode(TextFunctions.words(col(textCol))).as("w"))
      .select(col(idCol), md5(col("w").cast("binary")).as("h"))
      .select(col(idCol), explode(sequence(lit(1), lit(32))).as("k"), col("h"))
      .groupBy(col(idCol), col("k"))
      .agg(sum(
        when(expr("substr(h, k, 1)").isin(hexHigh: _*), lit(1)).otherwise(lit(-1))
      ).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("CAST(POW(2, k-1) AS BIGINT)")).otherwise(lit(0L)))
        .as("simhash"))
  }

  /** Embedding-cosine near-dup pairs above `threshold` (id-only output;
    * the cosine itself is float-precision-sensitive across engines).
    * Brute force at test SF; sign-bucket prefilter at scale. */
  def embeddingNearDups(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosineSim(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
