package graft.tools

import graft.GraftSession
import graft.operators.Relational

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "4")
    val df = Relational.bucketedJoinRevenue(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
