package graft.stedi

import java.util.Base64

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** STEDI pipeline vs the reference's golden fixtures (FIXTURES.md §1,
  * reference spark-streaming-pipeline/README.md:56,99-103,159-165). */
class StediSpec extends SparkSpec {

  private val customerJson =
    """{"customerName":"Sam Test","email":"sam.test@test.com","phone":"8015551212","birthDay":"2001-01-03"}"""

  private def redisValue(encoded: String): String =
    s"""{"key":"Q3VzdG9tZXI=","existType":"NONE","Ch":false,"Incr":false,"zSetEntries":[{"element":"$encoded","score":"0.0"}]}"""

  private val riskJson =
    """{"customer":"sam.test@test.com","score":7.0,"riskDate":"2020-09-14T07:54:06.417Z"}"""

  test("customersWithBirthYear decodes the golden redis payload") {
    import spark.implicits._
    val enc = Base64.getEncoder.encodeToString(customerJson.getBytes("UTF-8"))
    val raw = Seq(("k", redisValue(enc))).toDF("key", "value")
    val out = Stedi.customersWithBirthYear(raw).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "sam.test@test.com")
    assert(out(0).getString(1) == "2001")
  }

  test("null email or birthDay rows are filtered (F1)") {
    import spark.implicits._
    val noEmail = """{"customerName":"X","phone":"1","birthDay":"1990-05-01"}"""
    val enc = Base64.getEncoder.encodeToString(noEmail.getBytes("UTF-8"))
    val raw = Seq(("k", redisValue(enc))).toDF("key", "value")
    assert(Stedi.customersWithBirthYear(raw).count() == 0)
  }

  test("customerRisk keeps score as STRING (reference parity)") {
    import spark.implicits._
    val raw = Seq(("k", riskJson)).toDF("key", "value")
    val out = Stedi.customerRisk(raw)
    assert(out.schema("score").dataType.typeName == "string")
    val row = out.collect()(0)
    assert(row.getString(0) == "sam.test@test.com")
    assert(row.getString(1) == "7.0")
  }

  test("batch pipeline joins risk with customers and emits the golden JSON contract") {
    import spark.implicits._
    val enc = Base64.getEncoder.encodeToString(customerJson.getBytes("UTF-8"))
    val redisRaw = Seq(("k", redisValue(enc))).toDF("key", "value")
    val riskRaw = Seq(("k", riskJson)).toDF("key", "value")
    val joined = Stedi.pipeline(redisRaw, riskRaw)
    val kafka = Stedi.toKafkaOutput(joined).collect()
    assert(kafka.length == 1)
    assert(kafka(0).getString(0) == "sam.test@test.com") // key = email
    val value = kafka(0).getString(1)
    // README.md:159-165 contract: customer, score, email, birthYear
    assert(value.contains(""""customer":"sam.test@test.com""""))
    assert(value.contains(""""score":"7.0""""))
    assert(value.contains(""""birthYear":"2001""""))
  }

  test("streaming pipeline: same transforms over MemoryStream, no watermark (J1)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val enc = Base64.getEncoder.encodeToString(customerJson.getBytes("UTF-8"))

    val redisIn = MemoryStream[(String, String)]
    val riskIn = MemoryStream[(String, String)]
    val redisRaw = redisIn.toDF().toDF("key", "value")
    val riskRaw = riskIn.toDF().toDF("key", "value")

    val out = Stedi.toKafkaOutput(Stedi.pipeline(redisRaw, riskRaw))
    assert(out.isStreaming)

    val query = out.writeStream
      .format("memory").queryName("stedi_out").outputMode("append").start()
    try {
      redisIn.addData(("k", redisValue(enc)))
      riskIn.addData(("k", riskJson))
      query.processAllAvailable()
      val rows = spark.table("stedi_out").collect()
      assert(rows.length == 1)
      assert(rows(0).getString(0) == "sam.test@test.com")
    } finally query.stop()
  }
}
