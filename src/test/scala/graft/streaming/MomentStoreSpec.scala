package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Regression

class MomentStoreSpec extends SparkSpec {

  private val epoch = "2024-01-01 00:00:00"

  private def ts(hours: Long, plusSec: Long = 0L): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
      .plusHours(hours).plusSeconds(plusSec))

  test("streamed merges equal the one-pass fit exactly; slicing never matters") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mom_stream").toString
    MomentStore.seed(spark, s"$dir/store", epoch)
    val rows = (1 to 300).map { i =>
      (if (i % 2 == 0) "a" else "b", ts(i % 50), (i % 17).toDouble + 0.25)
    }
    val (b1, rest) = rows.splitAt(60)
    val (b2, b3) = rest.splitAt(100)
    val in = MemoryStream[(String, Timestamp, Double)]
    val q = MomentStore.streamTo(
      in.toDF().toDF("grp", "ts", "v"), "grp", "ts", "v",
      s"$dir/store", s"$dir/ckpt").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = MomentStore.slopes(spark, s"$dir/store")
      .orderBy("grp").collect().map(_.toSeq)
    // one-pass reference over identical (x, y) derivations
    val onePass = Regression.groupedOls(
      rows.toDF("grp", "ts", "v")
        .select(col("grp"),
          expr(s"(unix_timestamp(ts) - unix_timestamp('$epoch')) div 3600").as("x"),
          floor(col("v") * 1000.0).cast("long").as("y")),
      "grp", "x", "y").orderBy("grp").collect().map(_.toSeq)
    assert(streamed.toSeq == onePass.toSeq,
      "streamed moment merge diverged from the single-pass fit")
  }

  test("pinned version reads never see a later version; retired pins refuse loudly — all four versioned stores") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mom_asof").toString

    // MomentStore: v0 seed, v1 first merge, v2 second merge
    MomentStore.seed(spark, s"$dir/mom", epoch)
    MomentStore.mergeBatch(
      Seq(("a", ts(1), 1.5), ("a", ts(2), 2.5), ("b", ts(1), 3.0))
        .toDF("grp", "ts", "v"), "grp", "ts", "v", s"$dir/mom")
    val atV1 = MomentStore.slopesAsOf(spark, s"$dir/mom", 1L)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    MomentStore.mergeBatch(
      Seq(("a", ts(3), 9.0), ("b", ts(4), 0.5)).toDF("grp", "ts", "v"),
      "grp", "ts", "v", s"$dir/mom")
    // the pin is UNCHANGED after the later merge (redelivery posture:
    // whatever arrives later, version 1's serving is immutable) ...
    assert(MomentStore.slopesAsOf(spark, s"$dir/mom", 1L)
      .orderBy("grp").collect().map(_.toSeq).toSeq == atV1)
    // ... and differs from the live read, which sees v2
    assert(MomentStore.slopes(spark, s"$dir/mom")
      .orderBy("grp").collect().map(_.toSeq).toSeq != atV1)
    // v0 fell off the grace window at v2's commit: loud refusal naming
    // the retained set, never a silent different version
    val gone = intercept[IllegalStateException] {
      MomentStore.readVersion(spark, s"$dir/mom", 0L)
    }
    assert(gone.getMessage.contains("does not retain version 0"), gone.getMessage)
    assert(gone.getMessage.contains("retained: 1, 2"), gone.getMessage)
    intercept[IllegalStateException] {
      MomentStore.readVersion(spark, s"$dir/mom", 99L)
    }

    // CountMinStream: the pinned sketch keeps v1's counts
    CountMinStream.seed(spark, s"$dir/cm", eps = 0.01, confidence = 0.9,
      sketchSeed = 7)
    CountMinStream.mergeBatch(
      Seq.fill(5)("hot").toDF("term"), "term", s"$dir/cm")
    CountMinStream.mergeBatch(
      Seq.fill(9)("hot").toDF("term"), "term", s"$dir/cm")
    val (skPin, _, _, _) = CountMinStream.readVersion(spark, s"$dir/cm", 1L)
    assert(skPin.estimateCount("hot") == 5L)
    assert(CountMinStream.read(spark, s"$dir/cm")._1.estimateCount("hot") == 14L)

    // HeavyHittersStream: the pinned summary is v1's
    HeavyHittersStream.seed(spark, s"$dir/hh", capacity = 4)
    HeavyHittersStream.mergeBatch(
      Seq("x", "x", "y").toDF("term"), "term", s"$dir/hh")
    HeavyHittersStream.mergeBatch(
      Seq.fill(6)("z").toDF("term"), "term", s"$dir/hh")
    val (pinItems, pinN, _) = HeavyHittersStream.readVersion(spark, s"$dir/hh", 1L)
    assert(pinN == 3L && !pinItems.contains("z"), pinItems.toString)
    assert(HeavyHittersStream.read(spark, s"$dir/hh")._2 == 9L)

    // BitmapStore: the pinned masks are v1's
    BitmapStore.seed(spark, s"$dir/bm")
    BitmapStore.mergeBatch(
      Seq(("g", 1L), ("g", 3L)).toDF("grp", "bucket"), "grp", "bucket", s"$dir/bm")
    BitmapStore.mergeBatch(
      Seq(("g", 5L)).toDF("grp", "bucket"), "grp", "bucket", s"$dir/bm")
    def mask(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("grp") === "g").select("mask").collect()(0).getLong(0)
    assert(mask(BitmapStore.readVersion(spark, s"$dir/bm", 1L)) == ((1L << 1) | (1L << 3)))
    assert(mask(BitmapStore.read(spark, s"$dir/bm")) ==
      ((1L << 1) | (1L << 3) | (1L << 5)))
  }

  test("uncommitted versions are skipped; next commit cleans the debris") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mom_crash").toString
    val store = s"$dir/store"
    MomentStore.seed(spark, store, epoch)
    MomentStore.mergeBatch(
      Seq(("g", ts(1), 2.0), ("g", ts(2), 4.0)).toDF("grp", "ts", "v"),
      "grp", "ts", "v", store)
    // crash mid-write: moments landed for v=99, meta (the commit) never did
    Seq(("junk", 0L, 0L, 0L, 0L, 0L))
      .toDF("grp", "n_rows", "sum_x", "sum_y", "sxy", "sxx")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/v=99/moments")
    val afterCrash = MomentStore.slopes(spark, store).collect()
    assert(afterCrash.map(_.getString(0)).toSeq == Seq("g"),
      "uncommitted version leaked into a read")
    MomentStore.mergeBatch(
      Seq(("g", ts(3), 6.0)).toDF("grp", "ts", "v"), "grp", "ts", "v", store)
    val m = MomentStore.slopes(spark, store).collect().head
    assert(m.getLong(1) == 3L, "post-crash merge lost admitted rows")
    assert(!new java.io.File(s"$store/v=99").exists(),
      "crashed version debris not cleaned by the next commit")
  }

  test("hand-checked slope through the store; epoch violation raises") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mom_hand").toString
    val store = s"$dir/store"
    MomentStore.seed(spark, store, epoch)
    // x = 0,1,2 hours; y = 0,2000,4000 millis -> slope exactly 2000
    MomentStore.mergeBatch(
      Seq(("g", ts(0), 0.0), ("g", ts(1), 2.0), ("g", ts(2), 4.0))
        .toDF("grp", "ts", "v"),
      "grp", "ts", "v", store)
    val m = MomentStore.slopes(spark, store).collect().head
    assert(m.getLong(4) == 12000L && m.getLong(5) == 6L) // num/den scale by 1000
    assert(m.getDouble(6) == 2000.0)
    // a row predating the pinned epoch must fail LOUDLY
    val e = intercept[Exception] {
      MomentStore.mergeBatch(
        Seq(("g", Timestamp.valueOf("2023-12-31 23:00:00"), 1.0))
          .toDF("grp", "ts", "v"), "grp", "ts", "v", store)
    }
    assert(e.getMessage != null)
  }

  test("exact delete == never admitted; impossible deletes refuse and commit " +
      "nothing; sketch stores refuse deletes by design") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mom_del").toString
    val store = s"$dir/store"
    MomentStore.seed(spark, store, epoch)
    val first = Seq(("a", ts(0), 0.0), ("a", ts(1), 2.0), ("a", ts(2), 4.0))
    val second = Seq(("b", ts(1), 3.0), ("b", ts(2), 5.0), ("c", ts(4), 7.0))
    MomentStore.mergeBatch(
      first.toDF("grp", "ts", "v"), "grp", "ts", "v", store)
    MomentStore.mergeBatch(
      second.toDF("grp", "ts", "v"), "grp", "ts", "v", store)
    // delete rows spanning both merges, including ALL of group c
    MomentStore.deleteBatch(
      Seq(("a", ts(2), 4.0), ("c", ts(4), 7.0)).toDF("grp", "ts", "v"),
      "grp", "ts", "v", store)
    val served = MomentStore.slopes(spark, store)
      .orderBy("grp").collect().map(_.toSeq).toSeq

    // bit-identical to a store that NEVER admitted the deleted rows
    MomentStore.seed(spark, s"$dir/ref", epoch)
    MomentStore.mergeBatch(
      (first.take(2) ++ second.take(2)).toDF("grp", "ts", "v"),
      "grp", "ts", "v", s"$dir/ref")
    assert(served == MomentStore.slopes(spark, s"$dir/ref")
      .orderBy("grp").collect().map(_.toSeq).toSeq)
    // the fully-deleted group left the live serve, but the pinned
    // pre-delete version still serves it (the as-of fence survives)
    assert(!served.map(_.head).contains("c"))
    assert(MomentStore.slopesAsOf(spark, store, 2L)
      .collect().map(_.getString(0)).toSet == Set("a", "b", "c"))

    // a delete naming rows never admitted refuses BEFORE committing:
    // (1) unknown group -> count would go negative
    val unknown = intercept[IllegalStateException] {
      MomentStore.deleteBatch(
        Seq(("zzz", ts(1), 1.0)).toDF("grp", "ts", "v"),
        "grp", "ts", "v", store)
    }
    assert(unknown.getMessage.contains("never admitted"), unknown.getMessage)
    // (2) double-delete of one admitted row -> zero count, nonzero
    // moment remainder
    val double = intercept[IllegalStateException] {
      MomentStore.deleteBatch(
        Seq(("b", ts(1), 3.0), ("b", ts(1), 3.0)).toDF("grp", "ts", "v"),
        "grp", "ts", "v", store)
    }
    assert(double.getMessage.contains("never admitted"), double.getMessage)
    // neither refusal committed anything
    assert(MomentStore.slopes(spark, store)
      .orderBy("grp").collect().map(_.toSeq).toSeq == served)

    // the lossy sketch stores refuse deletes loudly, naming why
    CountMinStream.seed(spark, s"$dir/cm", eps = 0.01, confidence = 0.9,
      sketchSeed = 7)
    val cm = intercept[UnsupportedOperationException] {
      CountMinStream.deleteBatch(Seq("hot").toDF("term"), "term", s"$dir/cm")
    }
    assert(cm.getMessage.contains("cannot delete") &&
      cm.getMessage.contains("under-corrects"), cm.getMessage)
    HeavyHittersStream.seed(spark, s"$dir/hh", capacity = 4)
    val hh = intercept[UnsupportedOperationException] {
      HeavyHittersStream.deleteBatch(Seq("x").toDF("term"), "term", s"$dir/hh")
    }
    assert(hh.getMessage.contains("cannot delete") &&
      hh.getMessage.contains("under-corrects"), hh.getMessage)
    val bm = intercept[UnsupportedOperationException] {
      BitmapStore.deleteBatch(
        Seq(("g", 1L)).toDF("grp", "bucket"), "grp", "bucket", s"$dir/bm")
    }
    assert(bm.getMessage.contains("cannot delete") &&
      bm.getMessage.contains("under-corrects"), bm.getMessage)
  }

  test("versioned-store writes hold the single-writer lease: a racing " +
      "writer refuses instead of silently overwriting a version") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mom_writer").toString
    val store = s"$dir/store"
    MomentStore.seed(spark, store, epoch)
    MomentStore.mergeBatch(
      Seq(("g", ts(1), 2.0)).toDF("grp", "ts", "v"), "grp", "ts", "v", store)
    val before = MomentStore.slopes(spark, store)
      .collect().map(_.toSeq).toSeq

    // a rival writer holds the store (what two streams misconfigured
    // onto one storeDir look like): the merge refuses loudly and
    // commits nothing — without the lease both would write v=2 and
    // one admitted batch would vanish with no error anywhere
    val rival = MaintenanceLease.acquire(spark, store, "rival-stream")
    val refused = intercept[IllegalStateException] {
      MomentStore.mergeBatch(
        Seq(("g", ts(2), 4.0)).toDF("grp", "ts", "v"), "grp", "ts", "v", store)
    }
    assert(refused.getMessage.contains("under maintenance by 'rival"),
      refused.getMessage)
    assert(MomentStore.slopes(spark, store)
      .collect().map(_.toSeq).toSeq == before)
    MaintenanceLease.release(spark, rival)

    // cleared: the write proceeds and leaves no lease behind
    MomentStore.mergeBatch(
      Seq(("g", ts(2), 4.0)).toDF("grp", "ts", "v"), "grp", "ts", "v", store)
    assert(MomentStore.slopes(spark, store).collect().head.getLong(1) == 2L)
    assert(!new java.io.File(s"$store/${MaintenanceLease.LeaseFile}").exists())
  }
}
