package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Avro decode (S4/P14 hot path).
  *
  * The per-row Scala UDFs in [[AvroCodec]] box the byte array, build a
  * case class and re-encode it through an Encoder on every record —
  * all outside whole-stage codegen. [[AvroDecode]] replaces that on
  * the decode hot path: `doGenCode` emits one static call producing an
  * `InternalRow` directly (UTF8String fields, no case-class boxing),
  * so the decode stays inside the codegen'd stage and a corrupt
  * payload yields null instead of a task failure. The UDF variants
  * remain as the documented fallback.
  *
  * Reference contract: consumers decode Avro per record
  * (kafka-streaming-pipeline/consumers/consumer.py:45-47); producers
  * emit registry-framed messages (producers/models/producer.py:23-52)
  * — `registryFramed = true` strips the 5-byte magic+schema-id prefix
  * before decoding.
  */
case class AvroDecode(
    child: Expression, schemaJson: String, registryFramed: Boolean = false)
    extends UnaryExpression {

  override lazy val dataType: DataType = AvroRuntime.sparkType(schemaJson)
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(bytes: Any): Any =
    AvroRuntime.decodeToRowOrNull(schemaJson, registryFramed, bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("avroSchemaJson", schemaJson, "java.lang.String")
    val childGen = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $rowCls ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.sources.AvroRuntime.decodeToRowOrNull(
          $schemaRef, $registryFramed, ${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static decode kernel called from generated code, plus the Avro ->
  * Spark schema mapping. Parsed schemas and field converters are
  * cached per JVM keyed by schema text (executors pay setup once). */
object AvroRuntime {

  /** Per-thread decode scratch: the BinaryDecoder and GenericRecord are
    * reused across rows (`DecoderFactory.binaryDecoder(bytes, reuse)` /
    * `reader.read(reuse, dec)`), so the per-row hot path allocates
    * nothing but the decoded field values — [[toRow]] copies those out
    * before the next read, which is what makes record reuse safe. */
  private final class DecodeState {
    var decoder: org.apache.avro.io.BinaryDecoder = _
    var record: GenericRecord = _
  }

  private final case class Plan(
      schema: Schema, struct: StructType, convs: Array[AnyRef => Any]) {
    // GenericDatumReader is thread-safe after construction (its schema
    // resolver cache is per-thread internally); one per schema, not per row
    val reader = new org.apache.avro.generic.GenericDatumReader[GenericRecord](schema)
    val state: ThreadLocal[DecodeState] = ThreadLocal.withInitial(() => new DecodeState)
  }

  private val plans = TrieMap.empty[String, Plan]

  private def plan(json: String): Plan =
    plans.getOrElseUpdate(json, buildPlan(new Schema.Parser().parse(json)))

  /** Converters are compiled once per schema at plan time (closures per
    * field), so the per-row path does no schema dispatch — nested
    * records bind their sub-plan here, never re-deriving it per row. */
  private def buildPlan(s: Schema): Plan = {
    require(s.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got ${s.getType}")
    val fields = s.getFields
    val convs = new Array[AnyRef => Any](fields.size())
    val sparkFields = new Array[StructField](fields.size())
    var i = 0
    while (i < convs.length) {
      val f = fields.get(i)
      convs(i) = converter(f.schema())
      sparkFields(i) = StructField(f.name(), sparkFieldType(f.schema()), nullable = isNullable(f.schema()))
      i += 1
    }
    Plan(s, StructType(sparkFields), convs)
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.stream.anyMatch(_.getType == Schema.Type.NULL)

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes
    require(branches.size() == 2, s"only [null, T] unions are supported, got $s")
    if (branches.get(0).getType == Schema.Type.NULL) branches.get(1) else branches.get(0)
  }

  private def sparkFieldType(s: Schema): DataType = s.getType match {
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.UNION => sparkFieldType(nonNullBranch(s))
    case Schema.Type.RECORD => plan(s.toString).struct
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  /** The Avro record schema as a Spark StructType (field order preserved). */
  def sparkType(json: String): StructType = plan(json).struct

  /** Decode one payload to an InternalRow; null on null/corrupt input
    * (same tolerance contract as [[AvroCodec.decodeRecordOrNull]]). */
  def decodeToRowOrNull(json: String, registryFramed: Boolean, bytes: Array[Byte]): InternalRow =
    try {
      if (bytes == null) null
      else {
        val p = plan(json)
        val payload = if (registryFramed) AvroCodec.stripRegistryFrame(bytes) else bytes
        val st = p.state.get()
        st.decoder = org.apache.avro.io.DecoderFactory.get
          .binaryDecoder(payload, st.decoder)
        st.record = p.reader.read(st.record, st.decoder)
        toRow(st.record, p)
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  private def toRow(rec: GenericRecord, p: Plan): InternalRow = {
    val vals = new Array[Any](p.convs.length)
    var i = 0
    while (i < vals.length) {
      vals(i) = p.convs(i)(rec.get(i))
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private def converter(s: Schema): AnyRef => Any = s.getType match {
    case Schema.Type.UNION => converter(nonNullBranch(s))
    case Schema.Type.STRING | Schema.Type.ENUM =>
      v => if (v == null) null else UTF8String.fromString(v.toString)
    case Schema.Type.BYTES =>
      v => if (v == null) null else {
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      }
    case Schema.Type.FIXED =>
      v => if (v == null) null
        else v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
    case Schema.Type.RECORD =>
      val nested = buildPlan(s)
      v => if (v == null) null else toRow(v.asInstanceOf[GenericRecord], nested)
    case _ => v => v // INT/LONG/FLOAT/DOUBLE/BOOLEAN box directly
  }
}

/** Column-level API for the native decode. */
object AvroFunctions {
  def decodeExpr(schemaJson: String, registryFramed: Boolean = false)(c: Column): Column =
    GraftBridge.column(AvroDecode(GraftBridge.expression(c), schemaJson, registryFramed))
}
