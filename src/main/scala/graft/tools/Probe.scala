package graft.tools

import graft.GraftSession

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val df = graft.SparkEntry.queries("q64_incremental_dedup")(spark, dir)
      println(s"### q64 $dir rows=" + df.count())
      df.show(5, false)
      println("### cacheManager empty after q64: " + spark.sharedState.cacheManager.isEmpty)
      val q17 = graft.SparkEntry.queries("q17_ngram_jaccard")(spark, dir)
      println(s"### q17 $dir rows=" + q17.count())
      println("### cacheManager empty after q17: " + spark.sharedState.cacheManager.isEmpty)
    }
    spark.stop()
  }
}
