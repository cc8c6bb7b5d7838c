package graft.tools

import graft.GraftSession

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val a = graft.SparkEntry.queries("q52_neardup_clusters")(spark, dir).collect().toSet
      val b = graft.SparkEntry.queries("q65_neardup_clusters_winnowed")(spark, dir).collect().toSet
      println(s"### $dir q52=${a.size} q65=${b.size} equal=${a == b}")
    }
    spark.stop()
  }
}
