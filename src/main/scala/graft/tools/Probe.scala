package graft.tools

import graft.GraftSession

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q59_decontamination", "q62_embed_decontamination", "q63_winnowing_pairs")) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
