package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NfcNormalize / StripAccents: composition equivalence, idempotence,
  * the zero-allocation ASCII fast path, and the SQL registration.
  */
class UnicodeSpec extends SparkSpec {

  private val decomposed = "cafe\u0301" // e + combining acute
  private val precomposed = "caf\u00e9" // e-acute as one code point

  test("NFC folds decomposed and precomposed forms to identical bytes") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq((1L, decomposed), (2L, precomposed)).toDF("id", "s")
      .select(col("id"), UnicodeExpressions.nfcCol(col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out(1L) == precomposed) // NFC prefers the composed form
    // exact-dedup consequence: distinct collapses after normalization
    val df = Seq(decomposed, precomposed).toDF("s")
    assert(df.distinct().count() == 2L)
    assert(df.select(UnicodeExpressions.nfcCol(col("s"))).distinct().count() == 1L)
  }

  test("NFC is idempotent; ASCII passes through as the SAME object") {
    import org.apache.spark.unsafe.types.UTF8String
    val once = UnicodeExpressions.nfc(UTF8String.fromString(decomposed))
    assert(UnicodeExpressions.nfc(once) == once)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(UnicodeExpressions.nfc(ascii) eq ascii)
    assert(UnicodeExpressions.stripAccents(ascii) eq ascii)
  }

  test("stripAccents folds marks from BOTH forms; keeps base letters") {
    import org.apache.spark.unsafe.types.UTF8String
    def fold(s: String): String =
      UnicodeExpressions.stripAccents(UTF8String.fromString(s)).toString
    assert(fold(decomposed) == "cafe")
    assert(fold(precomposed) == "cafe")
    assert(fold("M\u00fcnchen") == "Munchen")   // precomposed
    assert(fold("Mu\u0308nchen") == "Munchen")  // decomposed
    assert(fold("na\u00efve \u00c9cole") == "naive Ecole")
  }

  test("both expressions run inside WholeStageCodegen (no UDF boxing)") {
    val spark0 = spark
    import spark0.implicits._
    // range-backed, non-foldable input (a literal would be constant-
    // folded at plan time and the expressions would vanish)
    val q = spark.range(3)
      .select(concat(lit(decomposed), col("id").cast("string")).as("s"))
      .select(UnicodeExpressions.nfcCol(col("s")).as("n"),
        UnicodeExpressions.stripAccentsCol(col("s")).as("f"))
      .filter(length(col("n")) > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("nfc_normalize") && plan.contains("strip_accents"), plan)
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    val rows = q.as[(String, String)].collect()
    assert(rows.length == 3 &&
      rows.forall { case (n, f) => n.startsWith(precomposed) && f.startsWith("cafe") })
  }

  test("SQL registration: nfc_normalize / strip_accents callable from SQL") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS n, " +
        s"strip_accents('$decomposed') AS f").collect()(0)
    assert(r.getString(0) == precomposed && r.getString(1) == "cafe")
  }
}
