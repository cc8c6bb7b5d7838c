package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
