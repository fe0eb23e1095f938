package graft

import org.apache.spark.sql.SparkSession

/** Session factory with Spark-first defaults that mirror what we would set
  * on a real multi-executor cluster:
  *
  *  - AQE on (runtime re-plan, skew-join splitting, partition coalescing);
  *  - `spark.sql.shuffle.partitions` sized to the local thread count, not
  *    the 200 default (on a 1000-executor cluster this is instead sized to
  *    ~2-3x total cores, and AQE coalesces down);
  *  - UTC session timezone so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / ad-hoc runs. */
  def local(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
