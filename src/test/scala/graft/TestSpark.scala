package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark startup is the
  * dominant cost; suites must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4")
  val Sf = "/root/testdata/sf0.001"
}
