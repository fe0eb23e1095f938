package graft.sources

import org.apache.avro.generic.GenericData
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Avro decode/encode vs the reference's CTA schemas (FIXTURES.md §2). */
class AvroCodecSpec extends SparkSpec {

  test("arrival round-trip incl. nullable-union fields (S4)") {
    import spark.implicits._
    val bytes = AvroCodec.encodeRecord(AvroCodec.arrivalValueSchema) { r =>
      r.put("station_id", 40900)
      r.put("train_id", "BL001")
      r.put("direction", "a")
      r.put("line", "blue")
      r.put("train_status", "in_service")
      r.put("prev_station_id", null)
      r.put("prev_direction", null)
    }
    val df = Seq(Tuple1(bytes)).toDF("value")
    val row = df.select(AvroCodec.decodeArrival(col("value")).as("v"))
      .select("v.*").collect()(0)
    assert(row.getInt(0) == 40900)
    assert(row.getString(3) == "blue")
    assert(row.isNullAt(5) && row.isNullAt(6))
  }

  test("weather decode maps enum to symbol name (P14)") {
    import spark.implicits._
    val schema = new org.apache.avro.Schema.Parser().parse(AvroCodec.weatherValueSchema)
    val bytes = AvroCodec.encodeRecord(AvroCodec.weatherValueSchema) { r =>
      r.put("temperature", 71.5f)
      r.put("status", new GenericData.EnumSymbol(schema.getField("status").schema(), "partly_cloudy"))
    }
    val row = Seq(Tuple1(bytes)).toDF("value")
      .select(AvroCodec.decodeWeather(col("value")).as("v")).select("v.*").collect()(0)
    assert(row.getFloat(0) == 71.5f)
    assert(row.getString(1) == "partly_cloudy")
  }

  test("corrupt avro payloads decode to null, not task failure") {
    import spark.implicits._
    val good = AvroCodec.encodeRecord(AvroCodec.turnstileValueSchema) { r =>
      r.put("station_id", 1); r.put("station_name", "a"); r.put("line", "red")
    }
    val df = Seq(
      Tuple1(good),
      Tuple1(Array[Byte](-1, -1, -1, -1, -1)),
      Tuple1(Array.emptyByteArray),
      Tuple1(null.asInstanceOf[Array[Byte]])
    ).toDF("value")
    val out = df.select(AvroCodec.decodeTurnstile(col("value")).as("v")).collect()
    assert(out.count(!_.isNullAt(0)) == 1)
  }

  test("native decode expression matches the UDF fallback on every schema") {
    import spark.implicits._
    val arrival = AvroCodec.encodeRecord(AvroCodec.arrivalValueSchema) { r =>
      r.put("station_id", 40900); r.put("train_id", "BL001")
      r.put("direction", "b"); r.put("line", "blue"); r.put("train_status", "in_service")
      r.put("prev_station_id", 40800); r.put("prev_direction", "a")
    }
    val df = Seq(Tuple1(arrival)).toDF("value")
    val viaExpr = df.select(AvroCodec.decodeArrival(col("value")).as("v"))
      .select("v.*").collect()(0)
    val viaUdf = df.select(AvroCodec.decodeArrivalUdf(col("value")).as("v"))
      .select("v.*").collect()(0)
    assert(viaExpr.toSeq == viaUdf.toSeq)
  }

  test("native decode runs inside WholeStageCodegen (no UDF boxing)") {
    import spark.implicits._
    val good = AvroCodec.encodeRecord(AvroCodec.turnstileValueSchema) { r =>
      r.put("station_id", 1); r.put("station_name", "a"); r.put("line", "red")
    }
    // range-backed, non-foldable input (a literal would be constant-folded
    // at plan time and the expression would vanish from the physical plan)
    val q = spark.range(3)
      .select(when(col("id") >= 0, lit(good)).as("value"))
      .select(AvroCodec.decodeTurnstile(col("value")).as("v"))
      .filter(col("v.station_id") > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("avro_decode"), plan)
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(q.select("v.station_id").collect().map(_.getInt(0)).toSeq == Seq(1, 1, 1))
  }

  test("schema-registry framed payloads decode after the 5-byte strip") {
    import spark.implicits._
    val plain = AvroCodec.encodeRecord(AvroCodec.turnstileValueSchema) { r =>
      r.put("station_id", 7); r.put("station_name", "x"); r.put("line", "green")
    }
    val framed = AvroCodec.frameForRegistry(schemaId = 42, plain)
    // JVM-level round trip
    val rec = AvroCodec.decodeRecord(AvroCodec.turnstileValueSchema, framed, registryFramed = true)
    assert(rec.get("station_id") == 7)
    // column-level: framed decode succeeds; unframed bytes under the
    // framed flag and truncated frames are tolerant nulls
    val df = Seq(
      Tuple1(framed),
      Tuple1(plain),
      Tuple1(Array[Byte](0x00, 0x00))
    ).toDF("value")
    val out = df.select(AvroFunctions.decodeExpr(
        AvroCodec.turnstileValueSchema, registryFramed = true)(col("value")).as("v"))
      .collect()
    assert(!out(0).isNullAt(0) && out(0).getStruct(0).getInt(0) == 7)
    assert(out(1).isNullAt(0) || out(1).getStruct(0).getInt(0) != 7)
    assert(out(2).isNullAt(0))
  }

  test("avro_decode is SQL-callable after GraftFunctions.register") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    val good = AvroCodec.encodeRecord(AvroCodec.turnstileValueSchema) { r =>
      r.put("station_id", 9); r.put("station_name", "s"); r.put("line", "blue")
    }
    Seq(Tuple1(good)).toDF("value").createOrReplaceTempView("avro_in")
    val out = spark.sql(
      s"SELECT avro_decode(value, '${AvroCodec.turnstileValueSchema}').station_id AS sid " +
        "FROM avro_in").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(9))
  }

  test("turnstile encode/decode and key stamping round-trip (K3)") {
    import spark.implicits._
    val df = Seq((1234567890123L, 40900, "N/Clark Stop", "red"))
      .toDF("ms", "station_id", "station_name", "line")
    val packed = df.select(
      AvroCodec.encodeEventKey(struct(col("ms").as("timestamp"))).as("key"),
      AvroCodec.encodeTurnstile(
        struct(col("station_id"), col("station_name"), col("line"))).as("value"))
    val row = packed.select(
      AvroCodec.decodeEventKey(col("key")).as("k"),
      AvroCodec.decodeTurnstile(col("value")).as("v"))
      .select("k.timestamp", "v.station_id", "v.station_name", "v.line").collect()(0)
    assert(row.getLong(0) == 1234567890123L)
    assert(row.getInt(1) == 40900)
    assert(row.getString(2) == "N/Clark Stop")
  }
}
