package graft.stedi

import graft.SparkSpec

/** Malformed-input behavior: the decode chain must degrade to filtered
  * rows, not exceptions — from_json yields null structs, the F1 null
  * filter drops them (PERMISSIVE mode end-to-end). */
class StediRobustnessSpec extends SparkSpec {

  test("malformed redis payloads are dropped, valid rows survive") {
    import spark.implicits._
    val good = {
      val cj = """{"customerName":"A","email":"a@x.com","phone":"1","birthDay":"1990-01-02"}"""
      val enc = java.util.Base64.getEncoder.encodeToString(cj.getBytes("UTF-8"))
      s"""{"key":"k","existType":"NONE","Ch":false,"Incr":false,"zSetEntries":[{"element":"$enc","score":"0.0"}]}"""
    }
    val raw = Seq(
      ("k", good),
      ("k", "not json at all"),
      ("k", "{\"key\":\"k\"}"),                       // no zSetEntries
      ("k", """{"zSetEntries":[]}"""),                // empty array
      ("k", """{"zSetEntries":[{"element":"!!!not-base64!!!","score":"0"}]}"""),
      ("k", null.asInstanceOf[String])
    ).toDF("key", "value")
    val out = Stedi.customersWithBirthYear(raw).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a@x.com"))
  }

  test("malformed risk events are dropped by projection, not thrown") {
    import spark.implicits._
    val raw = Seq(
      ("k", """{"customer":"a@x.com","score":"2.5","riskDate":"x"}"""),
      ("k", "garbage"),
      ("k", null.asInstanceOf[String])
    ).toDF("key", "value")
    val rows = Stedi.customerRisk(raw).collect()
    // malformed rows become all-null rows; the downstream join's equi-key
    // null semantics drop them — assert the valid row parses and nulls
    // don't throw
    assert(rows.length == 3)
    assert(rows.count(r => !r.isNullAt(0)) == 1)
    val joined = Stedi.joinRiskWithCustomers(
      Stedi.customerRisk(raw),
      Seq(("a@x.com", "1990")).toDF("email", "birthYear"))
    assert(joined.count() == 1)
  }
}
