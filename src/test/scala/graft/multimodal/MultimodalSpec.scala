package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("pack builds binary payload + typed metadata struct") {
    val d = graft.Tables.table(spark, sf001, "documents").limit(10)
    val media = Multimodal.pack(d, "doc_id", "text", "image")
    assert(media.schema("payload").dataType.typeName == "binary")
    val row = media.select("meta.mime", "meta.n_bytes", "meta.checksum").collect()(0)
    assert(row.getString(0) == "application/x-graft-image")
    assert(row.getLong(1) > 0)
    assert(row.getString(2).length == 32)
  }

  test("resize stub normalizes payload size, frame sampling explodes rows") {
    val d = graft.Tables.table(spark, sf001, "documents").limit(20)
    val media = Multimodal.pack(d, "doc_id", "text", "video")
    val resized = Multimodal.resize(media, targetBytes = 64).collect()
    assert(resized.forall(_.n_bytes == 64L))
    assert(resized.forall(_.payload.length == 64))

    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
    val perMedia = frames.groupBy(col("media_id")).count().collect()
    assert(perMedia.forall(_.getLong(1) >= 1))
    // stride 2 with 32-byte frames: ~len/64 frames per doc
    val total = frames.count()
    assert(total > 20, s"expected row explosion, got $total")
  }

  test("mapPartitions decode (mapInPandas analog) matches the expression twin") {
    val d = graft.Tables.table(spark, sf001, "documents").limit(50)
    val media = Multimodal.pack(d, "doc_id", "text", "image")
    val viaPartitions = Multimodal.decodeFeatures(media).collect()
      .map(f => (f.media_id, f.n_bytes, f.width, f.height, f.checksum)).toSet
    val viaExpr = Multimodal.decodeFeaturesExpr(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet
    assert(viaPartitions == viaExpr)
  }
}
