package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan review (pushdown,
  * broadcast choice, codegen spans). `runMain graft.Explain [names...]`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.registry.map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
