package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM (sessions are
  * expensive; every suite reuses this). Built through GraftSession so tests
  * run under exactly the configs the driver entry points use. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", "4")
  val Sf0001 = "/root/testdata/sf0.001"
}
