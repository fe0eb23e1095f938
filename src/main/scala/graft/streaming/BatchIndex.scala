package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared reader for the durable per-batch index layout the streaming
  * dedup operators maintain: `dir/batch=N` partition directories plus
  * optional ROOT-level seed files (a batch backfill written without a
  * partition). Root files and partition dirs are listed and read as two
  * frames unioned — NOT one partition-discovery read, which would
  * reject the mixed layout with "Conflicting directory structures
  * detected" and halt the stream after its first written batch. The
  * listing is one driver-side directory scan (O(#batches) entries).
  *
  * Seed rows read as batch -1 (oldest history — visible to every batch
  * fence). Any read failure beyond a missing root propagates: silently
  * treating a corrupt index as empty would void the durable-dedup
  * guarantee and re-emit months of duplicates.
  */
private[streaming] object BatchIndex {

  /** Rows of `dir` written by batches strictly before `beforeBatch`
    * (all when omitted); columns = `dataSchema` + `batch` long. Empty
    * on a missing directory (the very first batch). */
  def read(
      spark: SparkSession, dir: String, dataSchema: StructType,
      beforeBatch: Long = Long.MaxValue): DataFrame = {
    val full = StructType(dataSchema.fields :+ StructField("batch", LongType))
    val empty = spark.createDataFrame(new java.util.ArrayList[Row](), full)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) empty
    else {
      val entries = fs.listStatus(root)
      val batchDirs = entries.filter(e =>
        e.isDirectory && e.getPath.getName.startsWith("batch="))
      val seedFiles = entries.filter(e =>
        e.isFile && e.getPath.getName.endsWith(".parquet"))
      // an unrecognized DIRECTORY would be silently skipped as history —
      // e.g. a seed written into a nested subdir instead of root files.
      // That is exactly the quiet data loss this reader must never
      // allow, so name it and fail instead (metadata dirs excepted).
      val strays = entries.filter(e => e.isDirectory &&
        !e.getPath.getName.startsWith("batch=") &&
        !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
      if (strays.nonEmpty) throw new IllegalStateException(
        s"index dir $dir contains non-batch subdirectories " +
          strays.map(_.getPath.getName).mkString("[", ", ", "]") +
          " — seed rows must be root-level parquet files or batch=N partitions")
      val parts =
        (if (batchDirs.isEmpty) Nil
         else Seq(spark.read.option("basePath", dir).schema(full)
           .parquet(batchDirs.map(_.getPath.toString).toIndexedSeq: _*))) ++
        (if (seedFiles.isEmpty) Nil
         else Seq(spark.read.schema(dataSchema)
           .parquet(seedFiles.map(_.getPath.toString).toIndexedSeq: _*)
           .withColumn("batch", lit(-1L))))
      parts.reduceOption(_.unionByName(_)).getOrElse(empty)
        .filter(coalesce(col("batch"), lit(-1L)) < beforeBatch)
    }
  }
}
