package graft.stedi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STEDI balance-risk pipeline (reference `spark-streaming-pipeline/
  * sparkpykafkajoin.py`), re-expressed as pure DataFrame -> DataFrame
  * transforms. Every function works identically on a batch DataFrame and
  * a streaming one (Kafka source) — that is the Spark property the whole
  * module leans on: one logical-plan definition, two execution modes.
  */
object StediSchemas {
  /** redis-server topic value (sparkpykafkajoin.py:15-33): nested
    * array-of-struct; score is STRING by the reference's declaration. */
  val redisServer: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("existType", StringType),
    StructField("Ch", BooleanType),
    StructField("Incr", BooleanType),
    StructField("zSetEntries", ArrayType(StructType(Seq(
      StructField("element", StringType),
      StructField("score", StringType)))))))

  /** Customer JSON inside zSetEntries[0].element (sparkpykafkajoin.py:36-43). */
  val customer: StructType = StructType(Seq(
    StructField("customerName", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("birthDay", StringType)))

  /** stedi-events topic value (sparkpykafkajoin.py:46-52). score stays
    * STRING end-to-end — the reference's oracle output depends on it. */
  val stediEvent: StructType = StructType(Seq(
    StructField("customer", StringType),
    StructField("score", StringType),
    StructField("riskDate", StringType)))
}

object Stedi {
  import StediSchemas._

  /** Kafka binary key/value -> string columns (P1). */
  def castKafkaStrings(df: DataFrame): DataFrame =
    df.selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value")

  /** redis-server value -> decoded customer records with birthYear:
    * from_json -> zSetEntries[0].element -> unbase64 -> from_json ->
    * null-filter -> split(birthDay,'-')[0] (P2-P8, F1, P6). */
  def customersWithBirthYear(redisRaw: DataFrame): DataFrame =
    castKafkaStrings(redisRaw)
      .withColumn("value", from_json(col("value"), redisServer))
      .select(col("value.*"))
      // reference semantics: SQL `zSetEntries[0]` under non-ANSI Spark 3
      // yields NULL when the array is empty; Spark 4 runs ANSI by default
      // where element_at throws — try_element_at preserves the original
      // null-on-missing behavior.
      .select(try_element_at(col("zSetEntries"), lit(1)).getField("element").as("encodedCustomer"))
      // unbase64 throws on malformed input under Spark 4 ANSI;
      // try_to_binary(.., 'base64') keeps the reference's tolerant
      // null-on-garbage behavior (decodes valid payloads identically).
      .withColumn("customer",
        try_to_binary(col("encodedCustomer"), lit("base64")).cast("string"))
      .withColumn("customer", from_json(col("customer"), customer))
      .select(col("customer.*"))
      .filter(col("email").isNotNull && col("birthDay").isNotNull)
      .select(col("email"), split(col("birthDay"), "-").getItem(0).as("birthYear"))

  /** stedi-events value -> (customer, score) risk stream (P2, P3, P10). */
  def customerRisk(eventsRaw: DataFrame): DataFrame =
    castKafkaStrings(eventsRaw)
      .withColumn("value", from_json(col("value"), stediEvent))
      .select(col("value.*"))
      .select(col("customer"), col("score"))

  /** The flagship inner equi-join (J1, sparkpykafkajoin.py:128-130).
    * Deliberately NO watermark — the reference keeps unbounded state; the
    * scale-safe variant is [[joinRiskWithCustomersWatermarked]]. */
  def joinRiskWithCustomers(risk: DataFrame, customers: DataFrame): DataFrame =
    risk.join(customers, expr("customer = email"))

  /** Watermarked variant for the 100 TB design: bounds join state.
    * The risk side must carry event-time `ts`, the customers side
    * `cust_ts`. Note the event-time RANGE constraint in the join
    * condition — for stream-stream inner joins a watermark alone does
    * not let Spark evict state; the range tells it how long each side's
    * rows can still match, after which state is dropped. */
  def joinRiskWithCustomersWatermarked(
      risk: DataFrame, customers: DataFrame,
      delay: String, joinWindow: String): DataFrame =
    risk.withWatermark("ts", delay)
      .join(
        customers.withWatermark("cust_ts", delay),
        expr(s"""customer = email
                 AND ts >= cust_ts - INTERVAL $joinWindow
                 AND ts <= cust_ts + INTERVAL $joinWindow"""))

  /** Kafka sink projection (K1): key=email, value=JSON of all columns. */
  def toKafkaOutput(joined: DataFrame): DataFrame =
    joined.selectExpr("email AS key", "to_json(struct(*)) AS value")

  /** End-to-end STEDI transform from two raw (key,value) frames. */
  def pipeline(redisRaw: DataFrame, riskRaw: DataFrame): DataFrame =
    joinRiskWithCustomers(customerRisk(riskRaw), customersWithBirthYear(redisRaw))
}
