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

  test("image payloads decode for REAL: ImageIO parses true dimensions") {
    // PNG via the JDK encoder; BMP hand-synthesized via BufferedImage too
    val png = Multimodal.syntheticPng(37, 11, tone = 5)
    assert(Multimodal.looksLikeImage(png))
    assert(Multimodal.decodeImage(png).contains((37, 11)))

    val bmpImg = new java.awt.image.BufferedImage(
      9, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bmpImg, "bmp", bos)
    val bmp = bos.toByteArray
    assert(Multimodal.looksLikeImage(bmp))
    assert(Multimodal.decodeImage(bmp).contains((9, 23)))

    // non-image bytes: sniff rejects, text payloads never probe a reader
    assert(!Multimodal.looksLikeImage("plain text".getBytes("UTF-8")))
    // sniffed-but-corrupt: magic matches, body truncated -> None, no throw
    assert(Multimodal.decodeImage(png.take(12)).isEmpty)
  }

  test("decodeFeatures end-to-end: packed PNGs report decoded dims, not stub math") {
    val spark0 = spark
    import spark0.implicits._
    val dims = Seq((1L, 31, 7), (2L, 4, 18), (3L, 100, 1))
      .toDF("id", "w", "h")
    val media = Multimodal.packImages(dims, "id", "w", "h")
    assert(media.schema("payload").dataType.typeName == "binary")
    val mimes = media.select("meta.mime").collect().map(_.getString(0)).toSet
    assert(mimes == Set("image/png"))
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(feats == Map(1L -> ((31, 7)), 2L -> ((4, 18)), 3L -> ((100, 1))))
    // and n_bytes is the ENCODED size (nonzero, not width*height)
    val nb = Multimodal.decodeFeatures(media).collect().map(_.n_bytes)
    assert(nb.forall(_ > 0))
  }

  /** Driver-side aHash from the synthesizer's pixel FORMULA — the same
    * arithmetic q145's oracle runs in SQL; the spec's ground truth. */
  private def formulaHash(tone: Int): (Long, Long, Long, Long) = {
    val g = Array.tabulate(64) { idx =>
      val v = ((idx % 8) * 31 + (idx / 8) * 17 + tone) & 0xffffff
      (((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255)) / 3
    }
    val mean = g.sum / 64
    def band(b: Int): Long = (0 until 16).foldLeft(0L) { (acc, j) =>
      if (g(b * 16 + j) > mean) acc | (1L << j) else acc
    }
    (band(0), band(1), band(2), band(3))
  }

  test("perceptualHash8 over DECODED pixels reproduces the formula hash bit for bit") {
    val spark0 = spark
    import spark0.implicits._
    val ids = Seq(0L, 3L, 17L, 250L, 251L, 502L)
    val media = Multimodal.packImages(
      ids.map(i => (i, 8, 8)).toDF("id", "w", "h"), "id", "w", "h")
    val got = Multimodal.perceptualHash8(media).collect()
      .map(h => h.media_id -> ((h.b0, h.b1, h.b2, h.b3))).toMap
    ids.foreach { i =>
      assert(got(i) == formulaHash((i % 251).toInt),
        s"decoded-pixel hash for id $i diverged from the pixel formula — " +
          "PNG round-trip is not pixel-exact")
    }
    // tone repeats mod 251 -> ids 0 and 251 must hash identically
    assert(got(0L) == got(251L))
  }

  test("perceptualNearDups matches brute-force hamming; cap require-asserted") {
    val spark0 = spark
    import spark0.implicits._
    val ids = (0L until 40L)
    val media = Multimodal.packImages(
      ids.map(i => (i, 8, 8)).toDF("id", "w", "h"), "id", "w", "h")
    val hs = Multimodal.perceptualHash8(media).collect()
      .map(h => h.media_id -> Seq(h.b0, h.b1, h.b2, h.b3)).toMap
    def ham(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val truth = (for {
      a <- ids; b <- ids if a < b && ham(hs(a), hs(b)) <= 3
    } yield (a, b, ham(hs(a), hs(b)).toLong)).toSet
    assert(truth.nonEmpty, "fixture produced no near-dup pairs")
    val mined = Multimodal.perceptualNearDups(
        Multimodal.perceptualHash8(media).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mined == truth,
      s"missing=${truth -- mined} extra=${mined -- truth}")
    intercept[IllegalArgumentException] {
      Multimodal.perceptualNearDups(
        Multimodal.perceptualHash8(media).toDF(), maxHamming = 4)
    }
  }

  test("perceptualHash8 refuses non-8x8 payloads loudly") {
    val spark0 = spark
    import spark0.implicits._
    val media = Multimodal.packImages(
      Seq((1L, 9, 8)).toDF("id", "w", "h"), "id", "w", "h")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.perceptualHash8(media).collect()
    }
    assert(e.getMessage != null)
  }

  test("audio payloads decode for REAL: AudioSystem parses rate and samples") {
    // decode must reproduce the synthesis formula from the BYTES alone
    val id = 7L
    val n = (100 + id % 50).toInt
    val expected = (0 until n).map(i => ((id * 31 + i * 7) % 2001) - 1000)
    Multimodal.decodeWav(Multimodal.syntheticWav(id)) match {
      case Some((sr, samples)) =>
        assert(sr == 8000)
        assert(samples.length == n)
        assert(samples.map(_.toLong).toSeq == expected)
      case None => fail("AudioSystem must claim a well-formed PCM WAV")
    }
  }

  test("decodeAudioFeatures end-to-end: stats from parsed frames; garbage degrades") {
    val spark0 = spark
    import spark0.implicits._
    val media = Multimodal.packWavs(Seq(1L, 2L, 149L).toDF("id"), "id")
    val rows = Multimodal.decodeAudioFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    for (id <- Seq(1L, 2L, 149L)) {
      val nExp = 100 + id % 50
      val samples = (0L until nExp).map(i => ((id * 31 + i * 7) % 2001) - 1000)
      val f = rows(id)
      assert(f.sample_rate == 8000 && f.n_samples == nExp)
      assert(f.sum_sq == samples.map(s => s * s).sum)
      assert(f.max_abs == samples.map(math.abs).max)
    }
    // corrupt payload: no reader claims it -> degrade row, not a crash
    val junk = media.limit(1)
      .selectExpr("media_id + 1000 AS media_id", "kind",
        "CAST('not a wav' AS BINARY) AS payload", "meta")
    val d = Multimodal.decodeAudioFeatures(junk).collect().head
    assert(d.sample_rate == -1 && d.n_samples == 0L && d.sum_sq == 0L)
  }

  test("GVID container round-trips: header, index, and REAL PNG frames") {
    val id = 9L // nf = 4 + 9%5 = 8, w = 16 + 1 = 17, h = 12 + 3 = 15
    val v = Multimodal.syntheticVideo(id)
    val parsed = Multimodal.parseGvid(v)
    assert(parsed.isDefined)
    val (w, h, frames) = parsed.get
    assert(w == 17 && h == 15 && frames.length == 8)
    // every frame is a REAL PNG decoding to the header dims
    frames.foreach { fb =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
      assert(img != null && img.getWidth == w && img.getHeight == h)
    }
  }

  test("decodeVideoFrames: stride seeks via the index, sums match the formula") {
    val spark0 = spark
    import spark0.implicits._
    val media = Multimodal.packVideos(Seq(9L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.decodeVideoFrames(media, stride = 3)
      .collect().sortBy(_.frame_idx)
    // nf = 8 -> sampled frames 0, 3, 6
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    val (w, h) = (17L, 15L)
    rows.foreach { r =>
      val tone = (9L * 7 + r.frame_idx * 13) % 251
      val want = 31 * h * ((w - 1) * w / 2) + 17 * w * ((h - 1) * h / 2) +
        tone * w * h
      assert(r.width == 17 && r.height == 15 && r.sum_rgb == want,
        s"frame ${r.frame_idx}: got ${r.sum_rgb}, want $want")
    }
  }

  test("corrupt video containers degrade to a flagged row, never a crash") {
    val spark0 = spark
    import spark0.implicits._
    val good = Multimodal.syntheticVideo(3L)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val truncated = good.take(30) // header survives, index points past end
    // valid container + index, but one sampled frame's PNG bytes zeroed:
    // must also yield exactly ONE flagged row (never good frames mixed
    // with duplicate (id, -1) rows)
    val badFrame = Multimodal.syntheticVideo(3L)
    val bb = java.nio.ByteBuffer.wrap(badFrame)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(20) // first index entry: (offset, len) of frame 0
    val f0off = bb.getInt
    java.util.Arrays.fill(badFrame, f0off, f0off + 8, 0.toByte)
    val media = Seq(
      (1L, badMagic), (2L, truncated), (3L, Array[Byte](1, 2, 3)),
      (4L, badFrame))
      .toDF("media_id", "payload")
    val rows = Multimodal.decodeVideoFrames(media, stride = 1)
      .collect().sortBy(_.media_id)
    assert(rows.length == 4)
    assert(rows.forall(r => r.frame_idx == -1 && r.sum_rgb == 0L))
  }

  test("a structurally valid nFrames=0 container flags instead of vanishing") {
    val spark0 = spark
    import spark0.implicits._
    // hand-rolled header: magic/version/dims valid, zero frames, empty
    // index — parseGvid accepts it, so only the empty-sample guard can
    // keep the one-row-per-bad-media contract
    val bb = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")).putInt(1)
      .putInt(16).putInt(12).putInt(0)
    val media = Seq((5L, bb.array())).toDF("media_id", "payload")
    val rows = Multimodal.decodeVideoFrames(media, stride = 1).collect()
    assert(rows.toSeq.map(r => (r.media_id, r.frame_idx, r.sum_rgb)) ==
      Seq((5L, -1, 0L)))
  }
}
