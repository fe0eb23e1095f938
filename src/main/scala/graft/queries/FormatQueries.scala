package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** File-format source/sink coverage beyond parquet (SURVEY §2.1's
  * source family, widened to every format the runtime actually ships:
  * ORC rides Spark natively, CSV/JSON-lines are core; the spark-avro
  * FILE datasource jar is absent — payload-level Avro stays covered by
  * the custom codegen expressions, sources/AvroCodec). Each query is a
  * write-then-read ROUND-TRIP gated against the parquet-side oracle,
  * so a lossy encode (CSV null/empty collapse, JSON number widening,
  * ORC type mapping) hash-mismatches instead of passing silently.
  * Pushdown into each format's scan is spec-asserted
  * (FormatSourcesSpec) — at 100 TB a format whose scan cannot skip is
  * a migration source, not a serving layout.
  */
object FormatQueries {

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q130_orc_roundtrip",
      "ORC source/sink round-trip: documents metadata lands as " +
        "id-sorted ORC (min/max stripe stats usable), reads back " +
        "through a pushed-down filter, hash-gated against the parquet " +
        "oracle. ORC is the one columnar format Spark ships besides " +
        "parquet — the interchange path for Hive-era estates.",
      (spark, dir) => {
        val out = QueryScratch.dir("graft_q130_orc")
        Tables.table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite").orc(out)
        spark.read.schema(docsSchema).orc(out)
          .filter(col("n_chars") > 100)
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE n_chars > 100 ORDER BY doc_id""")),

    GraftQuery(
      "q131_csv_roundtrip",
      "CSV source/sink round-trip (S5's sink half): the full documents " +
        "table INCLUDING free text goes through quoted CSV and back " +
        "under an explicit schema — quoting, embedded delimiters, and " +
        "the empty-vs-null trap are exactly what the hash gate " +
        "catches. Header on, one shuffle-free pass each way.",
      (spark, dir) => {
        val out = QueryScratch.dir("graft_q131_csv")
        Tables.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars"))
          .write.mode("overwrite").option("header", "true").csv(out)
        spark.read
          .schema(StructType(Seq(
            StructField("doc_id", LongType), StructField("text", StringType),
            StructField("lang", StringType), StructField("source", StringType),
            StructField("n_chars", LongType))))
          .option("header", "true").csv(out)
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, text, lang, source, n_chars FROM documents
        ORDER BY doc_id""")),

    GraftQuery(
      "q132_jsonl_roundtrip",
      "JSON-lines source/sink round-trip: documents metadata out as " +
        "newline-delimited JSON, back under an explicit schema (never " +
        "inference — at 100 TB schema inference is a full extra scan " +
        "and a drifting contract), filter pushed to the scan, " +
        "hash-gated. The interchange format every ingestion pipeline " +
        "meets first.",
      (spark, dir) => {
        val out = QueryScratch.dir("graft_q132_jsonl")
        Tables.table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").json(out)
        spark.read.schema(docsSchema).json(out)
          .filter(col("lang") === "en")
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE lang = 'en' ORDER BY doc_id""")),

    GraftQuery(
      "q147_corrupt_quarantine",
      "Malformed-record QUARANTINE (PERMISSIVE + " +
        "columnNameOfCorruptRecord) — the 100 TB ingestion reality " +
        "q130-q132's clean round-trips skip: one JSONL fixture is " +
        "written with every doc_id % 10 == 3 line deliberately " +
        "broken, read back under an explicit schema with a corrupt-" +
        "record column, and rows split into parsed vs quarantined — " +
        "the job never dies, the bad lines never silently vanish. " +
        "Output is the classification census plus a content checksum " +
        "of the PARSED side (sum of n_chars), so a parser that " +
        "swallows a bad line as nulls, drops a good line, or " +
        "mis-parses a field all hash-mismatch against the oracle's " +
        "independent derivation from the clean table.",
      (spark, dir) => {
        val out = QueryScratch.dir("graft_q147_jsonl")
        val docs = Tables.table(spark, dir, "documents")
        docs.select(
            when(col("doc_id") % 10 === 3, lit("{not json"))
              .otherwise(to_json(struct(col("doc_id"), col("n_chars"))))
              .as("value"))
          .write.mode("overwrite").text(out)
        val schema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_chars", LongType),
          StructField("_bad", StringType)))
        spark.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .json(out)
          .agg(
            sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_ok"),
            sum(when(col("_bad").isNotNull, 1L).otherwise(0L))
              .as("n_quarantined"),
            sum(when(col("_bad").isNull, col("n_chars"))).as("sum_nchars_ok"))
      },
      Some("""
        SELECT CAST(count(*) FILTER (doc_id % 10 <> 3) AS BIGINT) AS n_ok,
               CAST(count(*) FILTER (doc_id % 10 = 3) AS BIGINT)
                 AS n_quarantined,
               CAST(sum(n_chars) FILTER (doc_id % 10 <> 3) AS BIGINT)
                 AS sum_nchars_ok
        FROM documents""")),

    GraftQuery(
      "q177_file_skipping",
      "File-level data skipping via a min/max manifest — the " +
        "Delta/Iceberg scan-pruning pattern built from parquet " +
        "primitives: orders lands key-sorted across range partitions " +
        "(so files hold near-disjoint o_orderkey ranges), a MANIFEST " +
        "of per-file (min, max, rows) is derived with one metadata-" +
        "cheap aggregate over input_file_name, and a range predicate " +
        "is answered by reading ONLY the files whose stat interval " +
        "overlaps it (driver-side file pick — the manifest is " +
        "file-count-sized, exactly what a table format keeps in its " +
        "log). The residual filter still pushes into the chosen " +
        "files' row-group stats. The oracle is the UNPRUNED predicate " +
        "over the base table — an identity gate proving skipping " +
        "lost nothing — and the query itself refuses to pass if no " +
        "file was skipped. At 100 TB this is the difference between " +
        "reading 3 files and reading 30,000.",
      (spark, dir) => {
        val out = QueryScratch.dir("graft_q177_skip")
        Tables.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey"))
          .write.mode("overwrite").parquet(out)
        val manifest = spark.read.parquet(out)
          .groupBy(input_file_name().as("f"))
          .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        // the global max IS the max of the per-file stats just collected
        // — re-aggregating the base table for it would be a second full
        // scan inside the very query whose point is scan avoidance
        val mx = manifest.map(_._3).max
        val (qLo, qHi) = (mx / 4, mx / 4 + mx / 10)
        val picked = manifest.filter { case (_, lo, hi) => lo <= qHi && hi >= qLo }
        require(picked.length < manifest.length,
          s"manifest pruned nothing (${picked.length}/${manifest.length} " +
            "files) — the sorted layout or the stats are broken")
        spark.read.parquet(picked.map(_._1).toIndexedSeq: _*)
          .filter(col("o_orderkey").between(qLo, qHi))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH M AS (SELECT max(o_orderkey) AS mx FROM orders)
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders, M
        WHERE o_orderkey BETWEEN mx // 4 AND mx // 4 + mx // 10
        ORDER BY o_orderkey""")),

    GraftQuery(
      "q186_schema_evolution",
      "Parquet schema evolution under mergeSchema — the 100 TB " +
        "reality that a table's files were written by different " +
        "pipeline generations: generation 1 files carry (doc_id, " +
        "n_chars), generation 2 adds a lang column, both live under " +
        "one hive-partitioned root (gen=N — partition DISCOVERY types " +
        "the generation column). One mergeSchema read must union the " +
        "schemas, null-fill the missing column for old files, and " +
        "keep every row — silent row loss or a wrongly-typed evolved " +
        "column is exactly what the hash gate catches. The oracle " +
        "re-derives the merged view from the base table with the " +
        "same generation split.",
      (spark, dir) => {
        val out = QueryScratch.dir("graft_q186_evo")
        val d = Tables.table(spark, dir, "documents")
        d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$out/gen=1")
        d.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("n_chars"), col("lang"))
          .write.mode("overwrite").parquet(s"$out/gen=2")
        spark.read.option("mergeSchema", "true").parquet(out)
          .select(col("doc_id"), col("n_chars"), col("lang"),
            col("gen").cast("int").as("gen"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, n_chars,
               CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS gen
        FROM documents ORDER BY doc_id"""))
  )
}
