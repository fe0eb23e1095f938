package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The non-parquet file formats (q130-q132) earn their serving claims:
  * filters reach each format's scan as PushedFilters, and projection
  * pruning narrows ReadSchema — the two properties that decide whether
  * a format can skip work at 100 TB. */
class FormatSourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private def dump(fmt: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"fmt_$fmt").toString + "/d"
    val d = graft.Tables.table(spark, sf001, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    fmt match {
      case "orc" => d.write.mode("overwrite").orc(dir)
      case "csv" => d.write.mode("overwrite").option("header", "true").csv(dir)
      case "json" => d.write.mode("overwrite").json(dir)
    }
    dir
  }

  private def readBack(fmt: String, dir: String) = fmt match {
    case "orc" => spark.read.schema(schema).orc(dir)
    case "csv" => spark.read.schema(schema).option("header", "true").csv(dir)
    case "json" => spark.read.schema(schema).json(dir)
  }

  Seq("orc", "csv", "json").foreach { fmt =>
    test(s"$fmt scan: filter pushed down, projection pruned, values exact") {
      val dir = dump(fmt)
      val q = readBack(fmt, dir)
        .filter(col("n_chars") > 100).select("doc_id", "n_chars")
      val plan = q.queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*GreaterThan\\(n_chars".r
        .findFirstIn(plan).isDefined,
        s"$fmt scan did not receive the pushed filter:\n$plan")
      assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
        s"$fmt scan reads more columns than projected:\n$plan")
      val expect = graft.Tables.table(spark, sf001, "documents")
        .filter(col("n_chars") > 100)
        .select("doc_id", "n_chars").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(q.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet == expect)
    }
  }
}
