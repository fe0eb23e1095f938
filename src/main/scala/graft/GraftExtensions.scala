package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, IntArrayL2, L2Norm, MinHashSketchAgg, RollingHash, Sq8L2Distance, Sq8Quantize}
import graft.sources.AvroDecode

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works alongside the
  * Column API.
  *
  * Two paths:
  *  - [[GraftExtensions]]: `SparkSessionExtensions` injector for
  *    cluster-wide setup (`spark.sql.extensions=graft.GraftExtensions`);
  *  - [[GraftFunctions.register]]: runtime registration on an existing
  *    session (what tests and `SparkEntry.queries` use — the driver owns
  *    session construction, so extensions can't be assumed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions._
  override def apply(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

object GraftFunctions {
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "l2_norm" -> (es => L2Norm(es(0))),
    "rolling_hash" -> (es => RollingHash(es(0))),
    // aggregate: minhash_sketch(shingle, k [, family]) with literal k;
    // family is 'murmur64' (default) or the DuckDB-reproducible
    // 'md5chunk16'. NULL / non-foldable k or family degrade to sentinel
    // values the expression's checkInputDataTypes rejects with a proper
    // TypeCheckFailure instead of an analysis-time NPE.
    "minhash_sketch" -> (es => {
      def foldedOrNull(e: Expression): Any =
        if (e.foldable) e.eval() else null
      val k = foldedOrNull(es(1)) match {
        case i: Int => i
        case _ => -1
      }
      val family =
        if (es.length <= 2) "murmur64"
        else Option(foldedOrNull(es(2))).map(_.toString).getOrElse("<non-literal>")
      MinHashSketchAgg(es(0), k, family).toAggregateExpression()
    }),
    // avro_decode(bytes, 'schema-json' [, registryFramed]) — schema must
    // be a literal (it defines the output type at analysis time)
    "avro_decode" -> (es => AvroDecode(
      es(0),
      es(1).eval().toString,
      if (es.length > 2) es(2).eval().asInstanceOf[Boolean] else false)),
    // SQ8 family: ranges are literal double arrays (plan-embedded global
    // stats); non-literal ranges degrade to the empty seq the
    // expressions' checkInputDataTypes rejects cleanly
    "sq8_quantize" -> (es =>
      Sq8Quantize(es(0), foldedDoubles(es(1)), foldedDoubles(es(2)))),
    "sq8_l2_distance" -> (es =>
      Sq8L2Distance(es(0), es(1), foldedDoubles(es(2)), foldedDoubles(es(3)))),
    "int_array_l2" -> (es => IntArrayL2(es(0), es(1))),
    "jaro_winkler_sim" -> (es =>
      graft.functions.JaroWinklerSim(es(0), es(1))),
    "nfc_normalize" -> (es => graft.functions.NfcNormalize(es(0))),
    "strip_accents" -> (es => graft.functions.StripAccents(es(0))))

  // Bad range arguments fail HERE with the actual cause, not downstream:
  // degrading silently to an empty Seq made the expressions'
  // checkInputDataTypes report the misleading "requires equal-length
  // non-empty min/max ranges, got 0 and 0" for every failure mode.
  private def rangeError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))

  private def foldedDoubles(e: Expression): Seq[Double] = {
    if (!e.foldable) rangeError(
      "sq8 ranges must be foldable literal arrays of doubles " +
        "(plan-embedded global stats), got a non-literal expression: " + e.sql)
    val vals = e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        e.dataType match {
          case org.apache.spark.sql.types.ArrayType(et, _) =>
            (0 until a.numElements()).map(i => a.get(i, et) match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float => f.doubleValue()
              case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
              case n: java.lang.Number => n.doubleValue()
              // a NULL / non-numeric element would quantize everything to
              // code 0 through NaN arithmetic — name the element instead
              case null => rangeError(
                s"sq8 range arrays must not contain NULL (element $i of ${e.sql})")
              case other => rangeError(
                s"sq8 range arrays must hold numbers, got '$other' " +
                  s"(element $i of ${e.sql})")
            })
          case _ => rangeError(
            "sq8 ranges must be arrays of doubles, got " + e.dataType.sql)
        }
      case _ => rangeError(
        "sq8 ranges must be arrays of doubles, got " + e.dataType.sql)
    }
    if (vals.exists(_.isNaN)) rangeError(
      "sq8 range arrays must not contain NaN: " + e.sql)
    vals
  }

  /** Idempotently register the graft functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, es => builder(es), "scala_udf")
    }
}
