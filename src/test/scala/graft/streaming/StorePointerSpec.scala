package graft.streaming

import graft.SparkSpec

class StorePointerSpec extends SparkSpec {

  test("publish/resolve/pin/retire lifecycle; racing publishers refuse") {
    val dir = java.nio.file.Files.createTempDirectory("store_ptr").toString
    val alias = s"$dir/alias"

    // no pointers yet: resolve refuses
    intercept[IllegalArgumentException] {
      StorePointer.resolve(spark, alias)
    }
    assert(StorePointer.publish(spark, alias, s"$dir/storeA") == 1L)
    assert(StorePointer.resolve(spark, alias) == s"$dir/storeA")
    assert(StorePointer.publish(spark, alias, s"$dir/storeB") == 2L)
    // live read cut over; the pin still answers with generation 1
    assert(StorePointer.resolve(spark, alias) == s"$dir/storeB")
    assert(StorePointer.resolveVersion(spark, alias, 1L) == s"$dir/storeA")
    assert(StorePointer.history(spark, alias) ==
      Seq(1L -> s"$dir/storeA", 2L -> s"$dir/storeB"))
    // unknown version refuses naming what IS retained
    val unknown = intercept[IllegalStateException] {
      StorePointer.resolveVersion(spark, alias, 9L)
    }
    assert(unknown.getMessage.contains("retained: 1, 2"), unknown.getMessage)

    // a rival holding the alias's write lease refuses a publish
    val rival = MaintenanceLease.acquire(spark, alias, "rival-publisher")
    val refused = intercept[IllegalStateException] {
      StorePointer.publish(spark, alias, s"$dir/storeC")
    }
    assert(refused.getMessage.contains("under maintenance by 'rival"),
      refused.getMessage)
    assert(StorePointer.resolve(spark, alias) == s"$dir/storeB")
    MaintenanceLease.release(spark, rival)

    // retiring pointers bounds the listing, never touches stores, and
    // keeps the newest generations
    assert(StorePointer.publish(spark, alias, s"$dir/storeC") == 3L)
    assert(StorePointer.retirePointers(spark, alias, keepLast = 2) == Seq(1L))
    assert(StorePointer.history(spark, alias).map(_._1) == Seq(2L, 3L))
    intercept[IllegalStateException] {
      StorePointer.resolveVersion(spark, alias, 1L)
    }
    intercept[IllegalArgumentException] {
      StorePointer.retirePointers(spark, alias, keepLast = 0)
    }
  }
}
