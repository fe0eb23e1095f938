package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-contract canary (TESTDATA.md): every table [[Tables]] serves
  * must load with EXACTLY the expected column names and dtypes, in
  * order. A driver-side testdata regeneration that drifts a dtype (the
  * round-10 incident: events.ts INT64-nanos -> timestamp[us]) fails
  * HERE with a one-line table+column+found-dtype diagnosis instead of
  * surfacing as N dead oracle queries in the round artifact.
  *
  * Also pins the two explicit events.ts recipes: the current
  * timestamp[us] generation and the legacy INT64 TIMESTAMP(NANOS) one
  * (synthesized parquet — the branch would otherwise be dead code with
  * zero coverage), plus the loud failure on any third encoding.
  */
class TablesSchemaSpec extends SparkSpec {

  /** Expected post-load schema per table: what [[Tables.table]] returns
    * (events is post-[[Tables.normalizeEventsTs]], so session-UTC
    * TimestampType; the raw timestamp[us] columns elsewhere read as
    * TimestampNTZType under Spark's parquet NTZ inference). */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  /** One line per drifted/missing/extra column, empty when identical. */
  private def schemaDiff(
      table: String, exp: Seq[(String, DataType)],
      found: StructType): Seq[String] = {
    val foundPairs = found.fields.toSeq.map(f => f.name -> f.dataType)
    if (foundPairs == exp) Nil
    else {
      val foundMap = foundPairs.toMap
      val expMap = exp.toMap
      val drift = exp.collect {
        case (n, t) if foundMap.contains(n) && foundMap(n) != t =>
          s"$table.$n: expected $t, found ${foundMap(n)}"
      }
      val missing = exp.collect {
        case (n, _) if !foundMap.contains(n) => s"$table.$n: MISSING" }
      val extra = foundPairs.collect {
        case (n, t) if !expMap.contains(n) => s"$table.$n: UNEXPECTED ($t)" }
      val reorder =
        if (drift.isEmpty && missing.isEmpty && extra.isEmpty)
          Seq(s"$table: column order changed — expected " +
            exp.map(_._1).mkString(",") + " found " +
            foundPairs.map(_._1).mkString(","))
        else Nil
      drift ++ missing ++ extra ++ reorder
    }
  }

  test("canary: every testdata table loads with the contract schema") {
    assert(expected.keySet == Tables.names.toSet,
      "spec tables out of sync with Tables.names")
    val diffs = Tables.names.flatMap { t =>
      schemaDiff(t, expected(t), Tables.table(spark, sf001, t).schema)
    }
    assert(diffs.isEmpty,
      "testdata schema drift (regeneration changed the contract?):\n  " +
        diffs.mkString("\n  "))
  }

  test("schemaDiff names table+column+found-dtype on a deliberate mutation") {
    val mutated = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val d = schemaDiff("events", expected("events"), mutated)
    assert(d == Seq("events.ts: expected TimestampType, found StringType"))
  }

  test("normalizeEventsTs fails loudly on an unknown ts encoding") {
    import spark.implicits._
    val bad = Seq(("2024-01-01T00:00:00", 1L)).toDF("ts", "event_id")
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(bad))
    assert(e.getMessage.contains("events.ts loaded as StringType"))
  }

  test("legacy INT64 TIMESTAMP(NANOS) parquet round-trips through the nanos branch") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64

    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withConf(conf).withType(schema).build()
    val fac = new SimpleGroupFactory(schema)
    // 2023-11-14T22:13:20.123456789Z — the sub-micro tail must truncate
    writer.write(fac.newGroup()
      .append("event_id", 1L).append("ts", 1700000000123456789L))
    writer.close()

    // plain read rejects NANOS; Tables.table must catch, enable the
    // legacy conf, re-read as long, and surface micro-precision ts
    val df = Tables.table(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"nanos branch produced ${df.schema("ts").dataType}")
    val got = df.select(unix_micros(col("ts"))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).head()
    assert(got == 1700000000123456L)
  }

  test("eventsStream starts on an initially-empty replay directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_empty").toString
    val df = graft.streaming.Replay.eventsStream(spark, dir)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType == TimestampType)
  }
}
