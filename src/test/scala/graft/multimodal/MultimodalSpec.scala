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
