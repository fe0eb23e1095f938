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

  /** STUB resize: a real implementation re-encodes the payload at the
    * target dimensions; the stub deterministically truncates/pads so the
    * batch shape (bytes in, bytes out, metadata recomputed) is real. */
  def stubResize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    // ??? <- real codec resize goes here when decoders ship
    if (payload.length >= targetBytes) payload.take(targetBytes)
    else payload ++ Array.fill[Byte](targetBytes - payload.length)(0)
  }

  case class ResizedMedia(media_id: Long, payload: Array[Byte], n_bytes: Long)

  def resize(media: DataFrame, targetBytes: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val out = stubResize(if (p == null) Array.emptyByteArray else p, targetBytes)
        ResizedMedia(id, out, out.length.toLong)
      })
  }

  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame-sampling: every `stride`-th fixed-size window of the
    * payload stands in for a decoded video frame — the row-explosion
    * shape (1 media row -> N frame rows) and downstream schema are what
    * the real decoder would feed. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val bytes = if (p == null) Array.emptyByteArray else p
        // ??? <- real frame decode goes here when decoders ship
        val starts = bytes.indices.by(frameBytes * stride)
        starts.iterator.zipWithIndex.map { case (s, i) =>
          Frame(id, i, bytes.slice(s, math.min(s + frameBytes, bytes.length)))
        }
      }
  }

  /** Expression-only twin of [[decodeFeatures]] (same arithmetic,
    * including the null-payload case: mapPartitions substitutes an
    * empty byte array, so the expression form coalesces lengths to 0)
    * used by the oracle-checked query — stays in whole-stage codegen. */
  def decodeFeaturesExpr(media: DataFrame): DataFrame = {
    val len = coalesce(octet_length(col("payload")), lit(0))
    media.select(
      col("media_id"),
      coalesce(col("meta.n_bytes"), lit(0L)).as("n_bytes"),
      (lit(640) + pmod(len, lit(640))).as("width"),
      (lit(360) + pmod(len, lit(360))).as("height"),
      col("meta.checksum").as("checksum"))
  }
}
