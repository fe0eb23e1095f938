package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.10): media payloads are
  * opaque `binary` columns travelling next to a typed metadata struct.
  *
  * The real decoders (image/audio/video libraries) are NOT available in
  * this environment, so the decode step is a clearly-marked deterministic
  * STUB — but everything Spark-side is real and tested: the schema shape,
  * the batch-oriented `mapPartitions` decode loop (the Scala analog of
  * `mapInPandas`: one iterator pass per partition, no per-row setup), and
  * the pushdown-friendly metadata projection.
  *
  * At 100 TB: payload bytes dominate, so (a) metadata lives in separate
  * columns for scan pruning — a metadata-only query never touches bytes;
  * (b) decode is per-partition with bounded batch memory; (c) features
  * are written to their own table keyed by media_id, never appended to
  * the payload row.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = true),    // opaque bytes
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", StringType))))))

  /** Pack a text/binary source column into the media shape (test stand-in
    * for reading real media files; payload = UTF-8 bytes). */
  def pack(df: DataFrame, idCol: String, srcCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(srcCol).cast("binary").as("payload"),
      struct(
        lit(s"application/x-graft-$kind").as("mime"),
        octet_length(col(srcCol).cast("binary")).cast("long").as("n_bytes"),
        md5(col(srcCol).cast("binary")).as("checksum")).as("meta"))

  case class MediaFeatures(
      media_id: Long, n_bytes: Long, width: Int, height: Int, checksum: String)

  /** STUB decode: a real implementation would parse the payload with an
    * image/audio codec here. The stub derives deterministic fake
    * dimensions from the byte length so the full pipeline (partition
    * batching, feature schema, downstream joins) is exercised end-to-end.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int) = {
    // ??? <- real codec call goes here (e.g. ImageIO.read) when the
    // runtime ships decoders; deterministic fake keeps tests hermetic.
    val n = payload.length
    (640 + n % 640, 360 + n % 360)
  }

  /** Batch decode via mapPartitions — the Scala analog of a Pandas UDF
    * over mapInPandas: one pass per partition, features out. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "meta.checksum").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, payload, checksum) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val (w, h) = stubDecode(bytes)
          MediaFeatures(id, bytes.length.toLong, w, h, checksum)
        }
      }
  }

  /** Expression-only twin of [[decodeFeatures]] (same arithmetic) used by
    * the oracle-checked query — stays in whole-stage codegen. */
  def decodeFeaturesExpr(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.n_bytes").as("n_bytes"),
      (lit(640) + pmod(octet_length(col("payload")), lit(640))).as("width"),
      (lit(360) + pmod(octet_length(col("payload")), lit(360))).as("height"),
      col("meta.checksum").as("checksum"))
}
