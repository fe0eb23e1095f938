package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

class StoreMaintenanceSpec extends SparkSpec {

  private val idSchema = StructType(Seq(StructField("doc_id", LongType)))

  test("plan: gauges read the layout; every decision branch honors the ops' " +
      "own refusal contracts") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("maint_plan").toString
    val idx = s"$dir/store"
    val docs = (1L to 40L).map(i => (i, s"document number $i body"))
      .toDF("doc_id", "text")
    (0 to 2).foreach(b => PostingsStream.appendBatch(
      docs.filter(col("doc_id") % 3 === b), "doc_id", "text", idx, b.toLong))

    // no tombstones: healthy under wide caps, compact under dir pressure
    val healthy = StoreMaintenance.plan(spark, idx, idSchema, 10L, 10L)
    assert(healthy == StoreMaintenance.MaintenancePlan(0L, 3L, 2L, 0L, "none", -1L))
    val pressed = StoreMaintenance.plan(spark, idx, idSchema, 1L, 10L)
    assert(pressed.action == "compact" && pressed.compactThrough == 1L)
    // the recommended compact actually runs (contract consistency)
    PostingsStream.compactIndex(spark, idx, pressed.compactThrough)
    val after = StoreMaintenance.plan(spark, idx, idSchema, 1L, 10L)
    assert(after.batchDirs == 1L && after.seedFiles > 0L &&
      after.action == "none", after.toString)

    // tombstones land: liability over cap purges; dir pressure on a
    // BATCH-ORDERED store purges too (compaction would refuse), while
    // the TERMINAL store may still compact
    (3 to 4).foreach(b => PostingsStream.appendBatch(
      docs.filter(col("doc_id") % 3 === b % 3), "doc_id", "text", idx, b.toLong))
    PostingsStream.deleteBatch(spark, idx,
      Seq(3L, 6L, 9L).toDF("doc_id"), "doc_id", batchId = 5L)
    assert(StoreMaintenance.plan(spark, idx, idSchema, 10L, 2L)
      .action == "purge")
    assert(StoreMaintenance.plan(spark, idx, idSchema, 1L, 10L,
      compactSafeWithTombstones = true).action == "compact")
    assert(StoreMaintenance.plan(spark, idx, idSchema, 1L, 10L,
      compactSafeWithTombstones = false).action == "purge")
    val gauged = StoreMaintenance.plan(spark, idx, idSchema, 10L, 10L)
    assert(gauged.tombstoneKeys == 3L && gauged.action == "none")

    // a single batch dir can never compact (the newest always stays):
    // dir pressure alone plans nothing on it
    val one = s"$dir/one"
    PostingsStream.appendBatch(docs, "doc_id", "text", one, 0L)
    assert(StoreMaintenance.plan(spark, one, idSchema, 0L, 10L)
      .action == "none")
    // a missing store gauges empty and plans nothing
    assert(StoreMaintenance.plan(spark, s"$dir/nope", idSchema, 0L, 0L) ==
      StoreMaintenance.MaintenancePlan(0L, 0L, -1L, 0L, "none", -1L))
  }

  test("planVector gauges the cell store and its own tombstone layout") {
    val spark0 = spark
    import spark0.implicits._
    val e = graft.Tables.table(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("maint_vec").toString
    val idx = s"$dir/index"
    VectorIndexStream.seedIndex(
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", idx, nLists = 8)
    VectorIndexStream.appendBatch(
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", idx, 0L)
    VectorIndexStream.appendBatch(
      e.filter(col("vec_id") % 4 === 1), "vec_id", "embedding", idx, 1L)

    val clean = StoreMaintenance.planVector(spark, idx, "vec_id", 10L, 10L)
    assert(clean.batchDirs == 2L && clean.maxBatch == 1L &&
      clean.tombstoneKeys == 0L && clean.action == "none")
    assert(StoreMaintenance.planVector(spark, idx, "vec_id", 1L, 10L)
      .action == "compact")

    VectorIndexStream.deleteBatch(
      spark, idx, Seq(2L, 4L).toDF("vec_id"), "vec_id", batchId = 2L)
    // the vector store is batch-ordered: dir pressure with tombstones
    // outstanding resolves to purge, matching compactIndex's refusal
    val pressed = StoreMaintenance.planVector(spark, idx, "vec_id", 1L, 10L)
    assert(pressed.tombstoneKeys == 2L && pressed.action == "purge")
    intercept[IllegalStateException] {
      VectorIndexStream.compactIndex(spark, idx, throughBatch = 0L)
    }
    // the recommended purge runs and clears both gauges
    VectorIndexStream.purgeTombstones(spark, idx, "vec_id")
    val cleared = StoreMaintenance.planVector(spark, idx, "vec_id", 1L, 10L)
    assert(cleared.tombstoneKeys == 0L && cleared.batchDirs == 0L &&
      cleared.action == "none", cleared.toString)
  }
}
