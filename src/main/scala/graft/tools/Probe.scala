package graft.tools

import graft.{GraftSession, Tables}

/** Scratch diagnostics main — prints schemas/plans while developing. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-probe", "8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for (t <- Seq("orders", "lineitem", "events", "documents", "embeddings")) {
      val df = if (t == "events") Tables.events(spark, dir) else Tables.table(spark, dir, t)
      println(s"== $t"); df.printSchema(); df.show(3, truncate = false)
    }
    spark.stop()
  }
}
