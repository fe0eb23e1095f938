package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one JVM-wide SparkSession (getOrCreate) across
  * suites, UTC, AQE on — same config surface as production. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("graft-test")

  def sf001 = "/root/testdata/sf0.001"
}
